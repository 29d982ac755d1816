"""Differential tests for the on-device moment engine.

The device kernel (retrieval/moment_device.py) must reproduce the host
postprocess (retrieval/moment.py::moment_query_metrics — itself differentially
verified against upstream's multiprocessing worker in test_reference_e2e)
decision-for-decision: greedy NMS tie order, grouped video order, the
robust-mAP flip at the grouped-last valid item, R@N over grouped positions,
and sklearn-tie AP.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vqwild_tpu.retrieval.moment import moment_query_metrics  # noqa: E402
from vqwild_tpu.retrieval.moment_device import (  # noqa: E402
    DeviceMomentEngine,
    _bucket_plan,
)


def _random_world(rng, n_videos, max_w=40, grid=True):
    counts = rng.integers(1, max_w, n_videos)
    vidx = np.repeat(np.arange(n_videos), counts)
    starts, ends = [], []
    for c in counts:
        if grid:  # integer-second 5 s grid like enumerate_moment_windows
            p = rng.integers(0, 40, c) * 5
            length = rng.integers(1, 27, c) * 5
        else:
            p = rng.integers(0, 200, c)
            length = rng.integers(1, 131, c)
        starts.append(p)
        ends.append(p + length)
    s_sec = np.concatenate(starts).astype(np.float64)
    e_sec = np.concatenate(ends).astype(np.float64)
    g = len(vidx)
    labels = np.array([rng.choice(["a", "b", "c", ""]) for _ in range(g)])
    h_iou = np.where(labels == "", 0.0, rng.random(g))
    # sprinkle exact boundary tIoUs to pin >= semantics
    h_iou[rng.integers(0, g, max(1, g // 10))] = 0.5
    return vidx, s_sec, e_sec, labels, h_iou


def _compare(engine, scores, q_label_names, ig_lists, vidx, s_sec, e_sec,
             labels, h_iou, r_at_n=(3, 5, 100), robust=True):
    q_ids = [engine.label_id(l) for l in q_label_names]
    ap_d, rec_d = engine.metrics(
        jnp.asarray(scores), q_ids, ig_lists, r_at_n, robust
    )
    for qi, qname in enumerate(q_label_names):
        iou_q = np.where(labels == qname, h_iou, 0.0)
        ignore_q = np.isin(vidx, ig_lists[qi])
        ap_h, rec_h = moment_query_metrics(
            scores[qi], vidx, s_sec, e_sec, iou_q, ignore_q,
            0.5, 0.5, r_at_n, robust,
        )
        assert ap_d[qi] == pytest.approx(ap_h, abs=2e-6), f"query {qi}"
        # integer hit counts / f64 division on both sides: exact
        np.testing.assert_allclose(rec_d[qi], rec_h, atol=1e-12)


class TestDeviceMomentEngine:
    def test_matches_host_postprocess_randomized(self):
        rng = np.random.default_rng(7)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 17)
        g = len(vidx)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 17, chunk=12, max_ignore=4
        )
        q_names = ["a", "b", "c"] * 4
        scores = rng.standard_normal((12, g)).astype(np.float32)
        # exact score ties (tie-group AP + stable NMS order must both agree)
        scores[0, :8] = 0.25
        scores[5, 10:15] = scores[5, 9]
        ig = [list(rng.choice(17, rng.integers(0, 4), replace=False))
              for _ in range(12)]
        _compare(engine, scores, q_names, ig, vidx, s_sec, e_sec, labels, h_iou)

    def test_blocked_nms_wide_videos_match_host(self):
        """Videos wide enough to take the blocked-NMS path (W > 64: the
        cross-block suppression pass + K-slot inner loops) must still match
        the host greedy decision-for-decision, ties included."""
        rng = np.random.default_rng(11)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 8, max_w=300)
        # force widths that pick K=64, 48, and 32 blocks (96/128/192/256
        # buckets) plus one narrow video through the unblocked loop
        g = len(vidx)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 8, chunk=6, max_ignore=4
        )
        scores = rng.standard_normal((6, g)).astype(np.float32)
        # dense exact ties inside single videos: greedy order inside and
        # across NMS blocks must fall back to global-index order identically
        scores[0, : min(100, g)] = 0.5
        scores[2] = np.round(scores[2] * 4) / 4  # many cross-video ties
        q_names = ["a", "b", "c", "a", "b", "c"]
        ig = [[], [1], [], [0, 3], [], [7]]
        _compare(engine, scores, q_names, ig, vidx, s_sec, e_sec, labels, h_iou)

    def test_blocked_nms_equals_naive_sequential(self):
        """_nms_sorted's blocked form vs the textbook one-slot-at-a-time loop
        on overlapping-heavy sorted geometry at block-boundary widths."""
        from vqwild_tpu.retrieval.moment_device import _nms_sorted

        def naive(ss, st, en, thresh):
            ss, st, en = map(np.asarray, (ss, st, en))
            q, v, w = ss.shape
            keep = np.zeros((q, v, w), bool)
            for qi in range(q):
                for vi in range(v):
                    supp = ss[qi, vi] == -np.inf
                    ln = en[qi, vi] - st[qi, vi] + 1.0
                    for i in range(w):
                        if supp[i]:
                            continue
                        inter = np.maximum(
                            0.0,
                            np.minimum(en[qi, vi, i], en[qi, vi])
                            - np.maximum(st[qi, vi, i], st[qi, vi])
                            + 1.0,
                        )
                        hit = inter * (1 + thresh) >= thresh * (ln[i] + ln)
                        supp[i + 1 :] |= hit[i + 1 :]
                    keep[qi, vi] = ~supp & (ss[qi, vi] > -np.inf)
            return keep

        rng = np.random.default_rng(5)
        for w in (96, 128, 192, 320, 768):
            q, v = 3, 4
            st = (rng.integers(0, 30, (q, v, w)) * 5).astype(np.float32)
            en = st + (rng.integers(1, 27, (q, v, w)) * 5).astype(np.float32)
            ss = np.sort(rng.standard_normal((q, v, w)).astype(np.float32))[
                ..., ::-1
            ].copy()
            # pads at the tail like the sorted engine layout
            n_pad = rng.integers(0, w // 2)
            if n_pad:
                ss[..., w - n_pad :] = -np.inf
                st[..., w - n_pad :] = 0.0
                en[..., w - n_pad :] = -1.0
            got = np.asarray(
                _nms_sorted(jnp.asarray(ss), jnp.asarray(st), jnp.asarray(en), 0.5)
            )
            np.testing.assert_array_equal(got, naive(ss, st, en, 0.5), err_msg=str(w))

    def test_partial_chunk_and_no_robust(self):
        rng = np.random.default_rng(3)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 9)
        g = len(vidx)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 9, chunk=8, max_ignore=4
        )
        scores = rng.standard_normal((3, g)).astype(np.float32)
        q_names = ["a", "b", "a"]
        ig = [[0], [], [2, 5]]
        _compare(engine, scores, q_names, ig, vidx, s_sec, e_sec, labels,
                 h_iou, robust=False)

    def test_all_gallery_ignored_query(self):
        """total_valid == 0 → ap 0, recalls 0 (host early-return parity)."""
        rng = np.random.default_rng(1)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 4)
        g = len(vidx)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 4, chunk=4, max_ignore=4
        )
        scores = rng.standard_normal((1, g)).astype(np.float32)
        _compare(engine, scores, ["a"], [[0, 1, 2, 3]], vidx, s_sec, e_sec,
                 labels, h_iou)

    def test_nongrid_geometry_still_matches(self):
        """Arbitrary integer-second windows (not the 5 s grid)."""
        rng = np.random.default_rng(11)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 11, grid=False)
        g = len(vidx)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 11, chunk=6, max_ignore=4
        )
        scores = rng.standard_normal((6, g)).astype(np.float32)
        q_names = ["a", "c", "b", "a", "c", "b"]
        ig = [[i] for i in range(6)]
        _compare(engine, scores, q_names, ig, vidx, s_sec, e_sec, labels, h_iou)

    def test_scan_dispatch_matches_per_chunk(self):
        """The super-chunked lax.map program (dispatch_scan) must equal the
        per-chunk path query-for-query, including replicated-pad chunks and
        the in-program bank gather."""
        rng = np.random.default_rng(13)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 13)
        g = len(vidx)
        d = 8
        bank = rng.standard_normal((19, d)).astype(np.float32)
        gallery = rng.standard_normal((g, d)).astype(np.float32)
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 13, chunk=4, max_ignore=3
        )
        # 10 real queries → 3 chunks of 4, padded to 4 chunks → 2 programs
        # of 2 chunks each, the last program half-padded
        qe, b, s = 10, 4, 2
        total = 16  # n_prog(2) * s(2) * b(4)
        q_names = [rng.choice(["a", "b", "c"]) for _ in range(qe)]
        q_rows = np.full((total, 2), -1, np.int32)
        q_lab = np.zeros(total, np.int32)
        ig = np.full((total, 3), -1, np.int32)
        for i in range(qe):
            nsel = int(rng.integers(1, 3))
            q_rows[i, :nsel] = rng.choice(19, nsel, replace=False)
            q_lab[i] = engine.label_id(q_names[i])
            nig = int(rng.integers(0, 3))
            ig[i, :nig] = rng.choice(13, nig, replace=False)
        q_rows[qe:] = q_rows[0]
        q_lab[qe:] = q_lab[0]
        ig[qe:] = ig[0]
        from vqwild_tpu.ops.ranking import gather_scores

        bank_d, gal_d = jnp.asarray(bank), jnp.asarray(gallery)
        engine.warm_scan(bank.shape, gallery.shape, s, 2, (3, 5), True)
        scan_ap, scan_rec = [], []
        for p in range(0, total // b, s):
            handle = engine.dispatch_scan(
                bank_d, gal_d,
                q_rows[p * b : (p + s) * b].reshape(s, b, 2),
                q_lab[p * b : (p + s) * b].reshape(s, b),
                ig[p * b : (p + s) * b].reshape(s, b, 3),
                (3, 5), True,
            )
            ap_p, rec_p = engine.finalize_scan(handle)
            scan_ap.append(ap_p)
            scan_rec.append(rec_p)
        scan_ap = np.concatenate(scan_ap)[:qe]
        scan_rec = np.concatenate(scan_rec)[:qe]
        for c in range(0, total, b):
            sc = jax.jit(gather_scores, static_argnames=("use_pallas",))(
                bank_d, gal_d, q_rows[c : c + b]
            )
            ap_c, rec_c = engine.metrics(
                sc, q_lab[c : c + b],
                [list(r[r >= 0]) for r in ig[c : c + b]],
                (3, 5), True,
            )
            for bi in range(b):
                i = c + bi
                if i >= qe:
                    continue
                assert scan_ap[i] == pytest.approx(ap_c[bi], abs=1e-12)
                np.testing.assert_allclose(scan_rec[i], rec_c[bi], atol=1e-12)

    def test_bucket_plan_covers_each_moment_once(self):
        rng = np.random.default_rng(5)
        counts = np.concatenate([[1, 16, 17, 40], rng.integers(1, 300, 20)])
        vidx = np.repeat(np.arange(len(counts)), counts)
        buckets = _bucket_plan(vidx, len(counts))
        seen = np.concatenate([b["gather"].ravel() for b in buckets])
        seen = seen[seen < len(vidx)]
        assert sorted(seen.tolist()) == list(range(len(vidx)))
        for b in buckets:
            w = b["gather"].shape[1]
            real = (b["gather"] < len(vidx)).sum(axis=1)
            assert (real <= w).all() and (real >= 1).all()

    def test_mesh_sharded_engine_matches_host(self):
        """Device engine over an 8-device mesh (query-row-sharded chunks,
        replicated bucket constants) ≡ the single-host postprocess."""
        from vqwild_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(23)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 21)
        g = len(vidx)
        n_dev = len(jax.devices())
        mesh = make_mesh((n_dev,), ("data",))
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 21,
            chunk=2 * n_dev, max_ignore=4, mesh=mesh,
        )
        assert engine.chunk % n_dev == 0
        q_names = (["a", "b", "c"] * 6)[: 2 * n_dev]
        scores = rng.standard_normal((len(q_names), g)).astype(np.float32)
        scores[1, :6] = 0.5  # exact ties across the shard boundary
        ig = [list(rng.choice(21, rng.integers(0, 4), replace=False))
              for _ in q_names]
        # feed mesh-committed scores like the sharded GalleryScorer would:
        # columns padded to the shard multiple (engine slices them off)
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad_g = (-g) % n_dev
        scores_padded = np.pad(scores, ((0, 0), (0, pad_g)))
        scores_dev = jax.device_put(
            scores_padded, NamedSharding(mesh, P(None, "data"))
        )
        q_ids = [engine.label_id(l) for l in q_names]
        ap_d, rec_d = engine.metrics(scores_dev, q_ids, ig, (3, 5, 100), True)
        for qi, qname in enumerate(q_names):
            iou_q = np.where(labels == qname, h_iou, 0.0)
            ignore_q = np.isin(vidx, ig[qi])
            ap_h, rec_h = moment_query_metrics(
                scores[qi], vidx, s_sec, e_sec, iou_q, ignore_q,
                0.5, 0.5, (3, 5, 100), True,
            )
            assert ap_d[qi] == pytest.approx(ap_h, abs=2e-6), f"query {qi}"
            np.testing.assert_allclose(rec_d[qi], rec_h, atol=1e-12)

    def test_mesh_partial_chunk(self):
        """A final partial chunk pads to the mesh-divisible chunk size."""
        from vqwild_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(29)
        vidx, s_sec, e_sec, labels, h_iou = _random_world(rng, 7)
        g = len(vidx)
        n_dev = len(jax.devices())
        mesh = make_mesh((n_dev,), ("data",))
        engine = DeviceMomentEngine(
            vidx, s_sec, e_sec, labels, h_iou, 7,
            chunk=n_dev, max_ignore=4, mesh=mesh,
        )
        scores = rng.standard_normal((3, g)).astype(np.float32)
        _compare(engine, scores, ["a", "b", "c"], [[0], [], [1]],
                 vidx, s_sec, e_sec, labels, h_iou)

    def test_engine_selection_equality_through_evaluator(self, tmp_path):
        """ARVRetrievalMoment(engine='device') ≡ engine='host' on a tiny
        world, full metric dict."""
        from tests.fixtures import build_tiny_arv

        from vqwild_tpu.data.frames import SyntheticFrameStore
        from vqwild_tpu.data.schema import load_moment_db
        from vqwild_tpu.retrieval import ARVRetrievalMoment
        from vqwild_tpu.retrieval.features import (
            FeatureExtractor,
            make_fake_feat_fn,
        )

        world = build_tiny_arv(str(tmp_path))
        spec = world["spec"]
        mdb = load_moment_db(world["moment_path"])

        def mk(engine):
            ex = FeatureExtractor(
                make_fake_feat_fn(32, seed=3),
                SyntheticFrameStore(),
                test_frames=4,
                test_batch_size=8,
                input_size=16,
                fake=True,
            )
            ev = ARVRetrievalMoment(
                mdb, spec, ex, workers=2, engine=engine, rank_chunk=16
            )
            return ev.evaluation()["map05"]

        dev = mk("device")
        host = mk("host")
        assert set(dev) == set(host)
        for k, v in host.items():
            if isinstance(v, float):
                assert dev[k] == pytest.approx(v, abs=5e-6), k
