import numpy as np
import pytest

from vqwild_tpu.ops import nms
from vqwild_tpu.retrieval.moment import moment_query_metrics

native_lib = pytest.importorskip("vqwild_tpu.native.lib")

pytestmark = pytest.mark.skipif(
    not native_lib.available(), reason="native engine not built (no g++?)"
)


class TestNativeNMS:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_numpy(self, seed):
        rng = np.random.default_rng(seed)
        n = 200
        start = rng.uniform(0, 500, n)
        dets = np.stack(
            [start, start + rng.uniform(1, 60, n), rng.random(n)], axis=1
        ).astype(np.float32)
        assert native_lib.temporal_nms(dets, 0.5) == nms.temporal_nms_np(dets, 0.5)

    def test_reference_fixture(self):
        dets = np.array(
            [[10, 20, 0.9], [12, 22, 0.8], [50, 60, 0.7]], dtype=np.float32
        )
        assert native_lib.temporal_nms(dets, 0.5) == [0, 2]


class TestNativeMomentBatch:
    def make_case(self, seed, Q=12, n_videos=10, moments_per_video=30):
        rng = np.random.default_rng(seed)
        n = n_videos * moments_per_video
        video_idx = np.repeat(np.arange(n_videos), moments_per_video).astype(np.int32)
        start = rng.uniform(0, 100, n).astype(np.float64)
        end = start + rng.uniform(5, 60, n)
        n_labels = 5
        hit_label = rng.integers(-1, n_labels, n).astype(np.int32)  # -1 = none
        hit_iou = rng.uniform(0, 1, n) * (hit_label >= 0)
        scores = rng.normal(size=(Q, n)).astype(np.float32)
        # inject score ties
        scores[:, ::7] = np.round(scores[:, ::7], 1)
        q_label = rng.integers(0, n_labels, Q).astype(np.int32)
        ignore_vids = np.full((Q, 5), -1, np.int32)
        for qi in range(Q):
            k = int(rng.integers(0, 4))
            ignore_vids[qi, :k] = rng.choice(n_videos, size=k, replace=False)
        return dict(
            scores=scores, video_idx=video_idx, start=start, end=end,
            hit_label=hit_label, hit_iou=hit_iou, q_label=q_label,
            ignore_vids=ignore_vids,
        )

    @pytest.mark.parametrize("seed", range(4))
    @pytest.mark.parametrize("robust", [True, False])
    def test_matches_python_postprocess(self, seed, robust):
        c = self.make_case(seed)
        rn = (5, 10, 30)
        ap_n, rec_n = native_lib.moment_batch(
            c["scores"], c["video_idx"], c["start"], c["end"],
            c["hit_label"], c["hit_iou"], c["q_label"], c["ignore_vids"],
            nms_thresh=0.5, tiou_thresh=0.5, r_at_n=rn, robust=robust,
            n_threads=4,
        )
        for qi in range(c["scores"].shape[0]):
            iou_q = np.where(c["hit_label"] == c["q_label"][qi], c["hit_iou"], 0.0)
            ig_set = set(c["ignore_vids"][qi][c["ignore_vids"][qi] >= 0].tolist())
            ignore_q = np.isin(c["video_idx"], list(ig_set))
            ap_py, rec_py = moment_query_metrics(
                c["scores"][qi].astype(np.float64),
                c["video_idx"], c["start"], c["end"], iou_q, ignore_q,
                nms_threshold=0.5, tiou_threshold=0.5, r_at_n=rn, robust=robust,
            )
            assert abs(ap_n[qi] - ap_py) < 1e-6, (qi, ap_n[qi], ap_py)
            np.testing.assert_allclose(rec_n[qi], rec_py, atol=1e-9)
