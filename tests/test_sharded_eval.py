import numpy as np
import pytest

from vqwild_tpu.data.frames import SyntheticFrameStore
from vqwild_tpu.data.schema import load_moment_db, load_trimmed_db
from vqwild_tpu.parallel.mesh import make_mesh
from vqwild_tpu.retrieval import ARVRetrievalClip, ARVRetrievalMoment, ARVRetrievalTrimmed
from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn
from vqwild_tpu.retrieval.sharded import GalleryScorer


def extractor():
    return FeatureExtractor(
        make_fake_feat_fn(32, seed=3),
        SyntheticFrameStore(),
        test_frames=8,
        test_batch_size=4,
        input_size=64,
        fake=True,
    )


class TestGalleryScorer:
    def test_sharded_scores_match_single(self):
        mesh = make_mesh()
        rng = np.random.default_rng(0)
        g = rng.normal(size=(37, 16)).astype(np.float32)  # ragged vs 8 shards
        q = rng.normal(size=(5, 16)).astype(np.float32)
        single = GalleryScorer(g, mesh=None)
        sharded = GalleryScorer(g, mesh=mesh)
        s0 = np.asarray(single.scores(q))
        s1 = np.asarray(sharded.scores(q))[:, : sharded.n]
        np.testing.assert_allclose(s0, s1, atol=1e-5)
        assert sharded.n_padded % 8 == 0

    def test_pad_columns_marks_padding_ignored(self):
        mesh = make_mesh()
        g = np.zeros((10, 4), np.float32)
        sc = GalleryScorer(g, mesh=mesh)
        tp, ig = sc.pad_columns(np.ones((2, 10), bool), np.zeros((2, 10), bool))
        assert tp.shape == (2, sc.n_padded)
        assert not tp[:, 10:].any()
        assert ig[:, 10:].all()


class TestShardedEvaluators:
    """All three evaluators must produce identical metrics on the 8-device
    CPU mesh and on a single device."""

    def test_trimmed(self, tiny_arv):
        db = load_trimmed_db(tiny_arv["db_path"])
        kw = dict(eval_split="validation", r_at_n=(5, 10), rank_chunk=16)
        r0 = ARVRetrievalTrimmed(db, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalTrimmed(
            db, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["ap"] - r1["ap"]) < 1e-6
        assert r0["recall"] == r1["recall"]

    def test_clip(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        kw = dict(clip_sec=6, r_at_n=(5, 10), check_completeness=False)
        r0 = ARVRetrievalClip(mdb, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalClip(
            mdb, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["ap"] - r1["ap"]) < 1e-6

    def test_moment(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        kw = dict(moment_clip_sec=5, max_clips_per_moment=3, r_at_n=(5,), workers=2)
        r0 = ARVRetrievalMoment(mdb, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalMoment(
            mdb, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["map05"]["ap"] - r1["map05"]["ap"]) < 1e-6


class TestFusedChunkMetrics:
    """The id-based fused chunk path (device-built tp/ignore masks + device
    query gather) must be bit-identical to the host-mask path it replaces —
    per-chunk traffic drops from two [Q,G] bool masks to a few KB of i32."""

    def _world(self, seed=0, n=41, d=16, b=7, k_src=3, qn=2):
        import jax.numpy as jnp

        from vqwild_tpu.ops.ranking import ranked_retrieval_metrics

        rng = np.random.default_rng(seed)
        g = rng.normal(size=(n, d)).astype(np.float32)
        # quantize features so ties occur and exercise the tie-group AP path
        g = np.round(g * 2) / 2
        labels = rng.integers(0, 5, n).astype(np.int32)
        vids = rng.integers(0, 11, n).astype(np.int32)
        q_rows = np.full((b, qn), -1, np.int32)
        q_src = np.full((b, k_src), -2, np.int32)
        q_lab = np.empty(b, np.int32)
        for bi in range(b):
            nsel = int(rng.integers(1, qn + 1))  # short query lists too
            rows = rng.choice(n, size=nsel, replace=False)
            q_rows[bi, :nsel] = rows
            q_lab[bi] = labels[rows[0]]
            nsrc = int(rng.integers(1, k_src + 1))
            q_src[bi, :nsrc] = rng.choice(11, size=nsrc, replace=False)
        # host reference: masks + explicit query means
        qf = np.stack(
            [
                np.mean([g[i] for i in q_rows[bi] if i >= 0], axis=0)
                for bi in range(b)
            ]
        )
        tp = labels[None, :] == q_lab[:, None]
        ignore = np.zeros((b, n), bool)
        for bi in range(b):
            ignore[bi] = np.isin(vids, q_src[bi][q_src[bi] >= 0])
        scores = np.asarray(GalleryScorer(g).scores(qf))
        ref = ranked_retrieval_metrics(
            jnp.asarray(scores),
            jnp.asarray(tp),
            jnp.asarray(ignore),
            r_at_n=(3, 5),
        )
        return g, labels, vids, q_rows, q_lab, q_src, ref

    def _check(self, mesh, exact=True):
        g, labels, vids, q_rows, q_lab, q_src, ref = self._world()
        sc = GalleryScorer(g, mesh=mesh)
        sc.set_columns(labels, vids)
        sc.set_query_bank(None)
        out = sc.chunk_metrics(q_rows, q_lab, q_src, r_at_n=(3, 5))
        if exact:
            np.testing.assert_array_equal(
                np.asarray(ref["ap"]), np.asarray(out["ap"])
            )
        else:
            # sharded matmul partial-sum order perturbs scores in the last
            # ulp (same as the pre-existing sharded scores path, tested to
            # 1e-5 above); metrics follow within float noise
            np.testing.assert_allclose(
                np.asarray(ref["ap"]), np.asarray(out["ap"]), atol=1e-6
            )
        np.testing.assert_array_equal(
            np.asarray(ref["recalls"]), np.asarray(out["recalls"])
        )
        np.testing.assert_array_equal(np.asarray(ref["npos"]), np.asarray(out["npos"]))

    def test_single_device(self):
        self._check(mesh=None)

    def test_mesh(self):
        self._check(mesh=make_mesh(), exact=False)

    def test_separate_query_bank(self):
        g, labels, vids, q_rows, q_lab, q_src, ref = self._world()
        sc = GalleryScorer(g)
        sc.set_columns(labels, vids)
        sc.set_query_bank(g.copy())  # same numerics through the bank path
        out = sc.chunk_metrics(q_rows, q_lab, q_src, r_at_n=(3, 5))
        np.testing.assert_array_equal(np.asarray(ref["ap"]), np.asarray(out["ap"]))


class TestFusedEvalMetrics:
    """The whole-eval lax.map program (one dispatch for every chunk) must
    match the per-chunk fused path element-wise, including the replicated-pad
    tail chunk whose extra outputs the caller drops."""

    def _world(self, n=41, d=16, n_queries=23, k_src=3, qn=2, seed=1):
        rng = np.random.default_rng(seed)
        g = np.round(rng.normal(size=(n, d)).astype(np.float32) * 2) / 2
        labels = rng.integers(0, 5, n).astype(np.int32)
        vids = rng.integers(0, 11, n).astype(np.int32)
        expanded = []
        for _ in range(n_queries):
            nsel = int(rng.integers(1, k_src + 1))
            expanded.append(list(rng.choice(n, size=nsel, replace=False)))
        return g, labels, vids, expanded

    def _run(self, mesh, exact=True, rank_chunk=8):
        from vqwild_tpu.retrieval.sharded import stack_query_chunks

        g, labels, vids, expanded = self._world()
        qe = len(expanded)
        q_rows_all, q_lab_all, q_src_all = stack_query_chunks(
            expanded,
            rank_chunk,
            2,
            3,
            label_id_of=lambda i: int(labels[i]),
            src_vids_of=lambda qs: [int(vids[i]) for i in qs],
        )
        # 23 queries / chunk 8 → 3 chunks with a padded tail
        assert q_rows_all.shape[0] == 3 and q_rows_all.shape[1] == 8
        assert (q_rows_all.reshape(-1, 2)[qe:] == q_rows_all[0, 0]).all()
        sc = GalleryScorer(g, mesh=mesh)
        sc.set_columns(labels, vids)
        sc.set_query_bank(None)
        out = sc.eval_metrics_all(q_rows_all, q_lab_all, q_src_all, r_at_n=(3, 5))
        ap = np.asarray(out["ap"]).reshape(-1)[:qe]
        recalls = np.asarray(out["recalls"]).reshape(-1, 2)[:qe]
        # per-chunk reference through the already-verified fused chunk path
        ref_ap, ref_rec = [], []
        for c in range(q_rows_all.shape[0]):
            r = sc.chunk_metrics(
                q_rows_all[c], q_lab_all[c], q_src_all[c], r_at_n=(3, 5)
            )
            ref_ap.append(np.asarray(r["ap"]))
            ref_rec.append(np.asarray(r["recalls"]))
        ref_ap = np.concatenate(ref_ap)[:qe]
        ref_rec = np.concatenate(ref_rec)[:qe]
        if exact:
            np.testing.assert_array_equal(ap, ref_ap)
        else:
            np.testing.assert_allclose(ap, ref_ap, atol=1e-6)
        np.testing.assert_array_equal(recalls, ref_rec)

    def test_single_device(self):
        self._run(mesh=None)

    def test_mesh(self):
        self._run(mesh=make_mesh(), exact=False)

    def test_warm_path_used(self):
        from vqwild_tpu.retrieval.sharded import stack_query_chunks

        g, labels, vids, expanded = self._world(n_queries=8)
        q_rows_all, q_lab_all, q_src_all = stack_query_chunks(
            expanded, 4, 2, 3,
            label_id_of=lambda i: int(labels[i]),
            src_vids_of=lambda qs: [int(vids[i]) for i in qs],
        )
        sc = GalleryScorer(g)
        sc.set_columns(labels, vids)
        sc.set_query_bank(None)
        sc.warm_eval_metrics(q_rows_all.shape[0], q_rows_all.shape[1], 2, 3,
                             r_at_n=(3, 5))
        warmed = sc.eval_metrics_all(
            q_rows_all, q_lab_all, q_src_all, r_at_n=(3, 5)
        )
        cold = sc.eval_metrics_all(
            q_rows_all + 0, q_lab_all, q_src_all, r_at_n=(3, 5)
        )
        np.testing.assert_array_equal(
            np.asarray(warmed["ap"]), np.asarray(cold["ap"])
        )


class TestDistributedInit:
    def test_single_process_noop(self):
        from vqwild_tpu.parallel.distributed import initialize

        assert initialize() is False
