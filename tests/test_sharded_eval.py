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


class TestDistributedInit:
    def test_single_process_noop(self):
        from vqwild_tpu.parallel.distributed import initialize

        assert initialize() is False
