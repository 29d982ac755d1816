import jax.numpy as jnp
import numpy as np
import pytest

from vqwild_tpu.ops import distance, metrics_np, nms, ranking, segment_pool


class TestDistance:
    def test_pairwise_sq_l2_matches_naive(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(7, 32)).astype(np.float32)
        g = rng.normal(size=(13, 32)).astype(np.float32)
        d = np.asarray(distance.pairwise_sq_l2(jnp.asarray(q), jnp.asarray(g)))
        naive = ((q[:, None] - g[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, naive, atol=1e-4)

    def test_score_is_negative_distance(self):
        q = np.eye(3, 4, dtype=np.float32)
        s = np.asarray(distance.score_matrix(jnp.asarray(q), jnp.asarray(q)))
        assert np.allclose(np.diag(s), 0.0, atol=1e-6)
        assert (s <= 1e-6).all()


class TestAveragePrecision:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_sklearn_random(self, seed):
        from sklearn.metrics import average_precision_score

        rng = np.random.default_rng(seed)
        n = 50
        y = rng.integers(0, 2, n)
        if y.sum() == 0:
            y[0] = 1
        s = rng.normal(size=n)
        ours = metrics_np.average_precision(y, s)
        ref = average_precision_score(y, s)
        assert abs(ours - ref) < 1e-10

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_sklearn_with_ties(self, seed):
        from sklearn.metrics import average_precision_score

        rng = np.random.default_rng(seed + 100)
        n = 60
        y = rng.integers(0, 2, n)
        if y.sum() == 0:
            y[0] = 1
        s = rng.integers(0, 6, n).astype(np.float64)  # heavy ties
        ours = metrics_np.average_precision(y, s)
        ref = average_precision_score(y, s)
        assert abs(ours - ref) < 1e-10


class TestRankedMetricsParity:
    """jax device implementation vs the numpy mirror (itself sklearn-exact)."""

    @pytest.mark.parametrize("robust", [True, False])
    def test_random_batches(self, robust):
        rng = np.random.default_rng(42)
        Q, G = 9, 40
        # quantized scores → heavy ties
        scores = rng.integers(0, 12, size=(Q, G)).astype(np.float32)
        tp = rng.random((Q, G)) < 0.2
        ignore = rng.random((Q, G)) < 0.15
        out = ranking.ranked_retrieval_metrics(
            jnp.asarray(scores), jnp.asarray(tp), jnp.asarray(ignore),
            r_at_n=(5, 10, 30), robust=robust,
        )
        for qi in range(Q):
            ap_np, rec_np = metrics_np.single_query_metrics(
                scores[qi], tp[qi], ignore[qi], r_at_n=(5, 10, 30), robust=robust
            )
            assert abs(float(out["ap"][qi]) - ap_np) < 1e-5, qi
            np.testing.assert_allclose(
                np.asarray(out["recalls"][qi]), rec_np, atol=1e-6
            )

    def test_robust_quirk_direction(self):
        """Forcing the last valid item tp must change AP but not R@N."""
        scores = np.array([[3.0, 2.0, 1.0, 0.5]], np.float32)
        tp = np.array([[True, False, False, False]])
        ignore = np.zeros((1, 4), bool)
        loose = ranking.ranked_retrieval_metrics(
            jnp.asarray(scores), jnp.asarray(tp), jnp.asarray(ignore),
            r_at_n=(2,), robust=True,
        )
        strict = ranking.ranked_retrieval_metrics(
            jnp.asarray(scores), jnp.asarray(tp), jnp.asarray(ignore),
            r_at_n=(2,), robust=False,
        )
        # robust AP = mean of precision at hit 1 (1/1) and forced hit (2/4)
        assert abs(float(loose["ap"][0]) - 0.75) < 1e-6
        assert abs(float(strict["ap"][0]) - 1.0) < 1e-6
        np.testing.assert_allclose(
            np.asarray(loose["recalls"]), np.asarray(strict["recalls"])
        )

    def test_ignore_handling(self):
        """Ignored items must not appear anywhere in ranking or counts."""
        scores = np.array([[5.0, 4.0, 3.0, 2.0, 1.0]], np.float32)
        tp = np.array([[True, True, False, True, False]])
        ignore = np.array([[False, True, False, False, False]])
        out = ranking.ranked_retrieval_metrics(
            jnp.asarray(scores), jnp.asarray(tp), jnp.asarray(ignore),
            r_at_n=(2,), robust=False, topk=3,
        )
        assert int(out["npos"][0]) == 2
        # top-2 valid = items 0, 2 → one tp
        assert abs(float(out["recalls"][0, 0]) - 0.5) < 1e-6
        assert out["top_idx"][0].tolist() == [0, 2, 3]


class TestNMS:
    def test_reference_fixture(self):
        """The reference's unit test fixture (unittests/dataset_tests.py):
        3 segments, two overlapping — highest-score survivor per cluster."""
        dets = np.array(
            [[10, 20, 0.9], [12, 22, 0.8], [50, 60, 0.7]], dtype=np.float32
        )
        keep = nms.temporal_nms(dets, thresh=0.5)
        assert keep == [0, 2]

    def test_plus_one_length_convention(self):
        # [0,10] vs [10,20]: inter = 1 (+1 convention), union = 21 → iou = 1/21
        dets = np.array([[0, 10, 1.0], [10, 20, 0.9]], dtype=np.float32)
        assert nms.temporal_nms(dets, thresh=0.04) == [0]  # 1/21 >= .04 → suppressed
        assert nms.temporal_nms(dets, thresh=0.05) == [0, 1]  # 1/21 < .05 → kept

    @pytest.mark.parametrize("seed", range(5))
    def test_np_matches_greedy_oracle(self, seed):
        rng = np.random.default_rng(seed)
        n = 30
        start = rng.uniform(0, 100, n)
        dets = np.stack(
            [start, start + rng.uniform(1, 30, n), rng.random(n)], axis=1
        ).astype(np.float32)
        keep = nms.temporal_nms_np(dets, 0.4)
        # oracle: quadratic greedy
        order = np.argsort(dets[:, 2])[::-1]
        kept = []
        for i in order:
            ok = True
            for j in kept:
                l_i = dets[i, 1] - dets[i, 0] + 1
                l_j = dets[j, 1] - dets[j, 0] + 1
                inter = max(
                    0.0, min(dets[i, 1], dets[j, 1]) - max(dets[i, 0], dets[j, 0]) + 1
                )
                if inter / (l_i + l_j - inter) >= 0.4:
                    ok = False
                    break
            if ok:
                kept.append(int(i))
        assert keep == kept


class TestSegmentPool:
    def test_window_mean_matches_slice_mean(self):
        rng = np.random.default_rng(0)
        tape = rng.normal(size=(50, 8)).astype(np.float32)
        starts = np.array([0, 10, 5, 49], np.int32)
        ends = np.array([10, 20, 50, 50], np.int32)
        out = np.asarray(
            segment_pool.sliding_window_mean(
                jnp.asarray(tape), jnp.asarray(starts), jnp.asarray(ends)
            )
        )
        for k, (a, b) in enumerate(zip(starts, ends)):
            np.testing.assert_allclose(out[k], tape[a:b].mean(0), atol=1e-5)

    def test_enumerate_clip_windows(self):
        # duration 20s, fps 3, clip 6s, tape of 60 frames
        starts, ends, locs = segment_pool.enumerate_clip_windows(
            20.0, 60, clip_sec=6, fps=3, temporal_stride=1
        )
        # clip starts 0,6,12 (18+6=24s→72 frames > 60 skipped; start 18 window ends 24*3=72>60)
        assert starts.tolist() == [0, 18, 36]
        assert ends.tolist() == [18, 36, 54]
        assert locs[1].tolist() == [6.0, 12.0]

    def test_enumerate_moment_windows_range_bound(self):
        # upstream: range(0, int(dur) - length, clip_sec) EXCLUDES start == dur-length
        starts, ends, locs = segment_pool.enumerate_moment_windows(
            20.0, 60, clip_sec=5, max_clips=3, fps=3, temporal_stride=1
        )
        # n=1: starts 0,5,10 (15 excluded); n=2: 0,5; n=3: 0
        assert locs.tolist() == [
            [0, 5], [5, 10], [10, 15],
            [0, 10], [5, 15],
            [0, 15],
        ]


class TestYUV420Wire:
    """The 1.5-byte/pixel host→device wire format (ops/preprocess.py)."""

    def _normalize_rgb(self, rgb_u8):
        from vqwild_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        x = rgb_u8.astype(np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def test_chroma_constant_roundtrip_exact(self):
        from vqwild_tpu.ops.preprocess import (
            normalize_clips_yuv420,
            rgb_to_yuv420_host,
        )

        # chroma constant within each 2x2 block → subsampling is lossless,
        # only uint8 rounding remains (≤ ~1.5/255 after the 3x3 roundtrip)
        rng = np.random.default_rng(0)
        small = rng.integers(0, 255, (2, 3, 8, 8, 3), np.uint8)
        rgb = np.repeat(np.repeat(small, 2, axis=2), 2, axis=3)  # [2,3,16,16,3]
        y, uv = rgb_to_yuv420_host(rgb)
        out = np.asarray(normalize_clips_yuv420(y, uv))
        want = self._normalize_rgb(rgb)
        # tolerance in normalized units: 2/255 / min(std) ≈ 0.035
        assert np.abs(out - want).max() < 0.04

    def test_natural_content_bounded_error(self):
        from vqwild_tpu.ops.preprocess import (
            normalize_clips_yuv420,
            rgb_to_yuv420_host,
        )

        # smooth gradient content (what video frames look like locally)
        h = w = 32
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        rgb = np.stack(
            [120 + 40 * np.sin(gx / 7), 90 + 30 * np.cos(gy / 9), 60 + gx + gy],
            axis=-1,
        )
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)[None, None]
        y, uv = rgb_to_yuv420_host(rgb)
        out = np.asarray(normalize_clips_yuv420(y, uv))
        want = self._normalize_rgb(rgb)
        assert np.abs(out - want).mean() < 0.05

    def test_crop_yuv_matches_rgb_crop(self):
        from vqwild_tpu.ops.preprocess import (
            crop_clips_host,
            crop_yuv420_host,
            rgb_to_yuv420_host,
        )

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (3, 2, 24, 30, 3), np.uint8)
        y, uv = rgb_to_yuv420_host(frames)
        offsets = np.array([[0, 2], [4, 6], [8, 10]], np.int32)  # even
        flips = np.array([False, True, False])
        cy, cuv = crop_yuv420_host(y, uv, offsets, flips, 16)
        rgbc = crop_clips_host(frames, offsets, flips, 16)
        ey, euv = rgb_to_yuv420_host(rgbc)
        np.testing.assert_array_equal(cy, ey)
        np.testing.assert_array_equal(cuv, euv)

    def test_odd_offsets_round_down_even(self):
        from vqwild_tpu.ops.preprocess import crop_yuv420_host, rgb_to_yuv420_host

        rng = np.random.default_rng(2)
        frames = rng.integers(0, 255, (1, 1, 20, 20, 3), np.uint8)
        y, uv = rgb_to_yuv420_host(frames)
        a = crop_yuv420_host(y, uv, [[3, 5]], [False], 8)
        b = crop_yuv420_host(y, uv, [[2, 4]], [False], 8)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_wire_bytes_halved(self):
        from vqwild_tpu.ops.preprocess import rgb_to_yuv420_host

        rgb = np.zeros((4, 8, 112, 112, 3), np.uint8)
        y, uv = rgb_to_yuv420_host(rgb)
        assert (y.nbytes + uv.nbytes) * 2 == rgb.nbytes
