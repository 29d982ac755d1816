import numpy as np
import pytest

from vqwild_tpu.data import labels as L
from vqwild_tpu.data import sampling, schema, transforms
from vqwild_tpu.data.clips import read_clip_normalized
from vqwild_tpu.data.frames import SyntheticFrameStore
from vqwild_tpu.data.triplets import PrefetchLoader, TripletDataset


class TestLabels:
    def test_registry_has_all_four_splits(self):
        reg = L.split_registry()
        assert set(reg) == {"100_20_80", "120_20_60", "80_20_100", "40_20_140"}
        for name, spec in reg.items():
            ntr = int(name.split("_")[0])
            assert len(spec.train_labels) == ntr
            assert len(spec.val_labels) == 20
            assert len(spec.test_labels) == 200 - ntr - 20
            assert len(set(spec.all_labels)) == 200
            assert set(spec.all_labels) == set(L.ACTIVITYNET_LABELS)

    def test_possible_classes(self):
        spec = L.get_split("100_20_80")
        val = spec.possible_classes("validation")
        test = spec.possible_classes("testing")
        assert len(val) == 120 and len(test) == 180
        assert set(spec.train_labels) <= set(val)
        assert set(spec.val_labels).isdisjoint(test)


class TestSampling:
    def test_segment_to_frames(self):
        assert sampling.segment_to_frames((2.0, 12.0)) == (6, 30)
        assert sampling.segment_to_frames((0.4, 0.9)) == (1, 1)

    def test_repeat_policy_short_segment(self):
        # 5 gt frames, 8 requested: cycle 0..4 then 0..2, +1 (1-based)
        idx = sampling.sample_frame_indices(10, 5, 8, total_frames=100)
        assert idx.tolist() == [11, 12, 13, 14, 15, 11, 12, 13]

    def test_linspace_policy_long_segment(self):
        idx = sampling.sample_frame_indices(0, 100, 4, total_frames=100)
        # linspace(0, 99, 4) = [0, 33, 66, 99], floored, clamped >= 1
        assert idx.tolist() == [1, 33, 66, 99]

    def test_clamping(self):
        idx = sampling.sample_frame_indices(95, 20, 4, total_frames=100)
        assert idx.max() <= 100 and idx.min() >= 1

    def test_zero_frames_raises(self):
        with pytest.raises(ValueError):
            sampling.sample_frame_indices(0, 0, 4, 10)

    def test_chunk_ranges(self):
        assert sampling.chunk_ranges(70, 32) == [(0, 32), (32, 32), (64, 6)]


class TestTransforms:
    def test_center_crop_round_down(self):
        p = transforms.center_crop_params(128, 171, 112)
        assert (p.top, p.left) == (8, 30)  # round((128-112)/2)=8, round(59/2)=30

    def test_random_crop_in_bounds(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            p = transforms.random_crop_params(rng, 128, 171, 112)
            assert 0 <= p.top <= 16 and 0 <= p.left <= 59

    def test_normalize_roundtrip(self):
        u8 = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(1, 2, 3, 3) * 10
        x = transforms.normalize_imagenet(u8)
        back = transforms.denormalize_imagenet(x) * 255.0
        np.testing.assert_allclose(back, u8.astype(np.float32), atol=1e-3)

    def test_apply_crop_flip(self):
        frames = np.arange(2 * 4 * 6 * 3, dtype=np.uint8).reshape(2, 4, 6, 3)
        p = transforms.CropParams(top=1, left=2, size=2, flip=True)
        out = transforms.apply_crop(frames, p)
        assert out.shape == (2, 2, 2, 3)
        np.testing.assert_array_equal(out[:, :, ::-1, :], frames[:, 1:3, 2:4, :])


class TestSchema:
    def test_trimmed_db_roundtrip(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        assert set(db.splits) == {"training", "validation", "testing"}
        flat = db.flat("validation")
        assert all(isinstance(r, schema.VideoRecord) for r in flat)
        noise = [r for r in flat if r.label == L.NOISE_LABEL]
        assert noise and all(r.retrieval_type == "noise" for r in noise)

    def test_fewshot_truncation(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        spec = tiny_arv["spec"]
        data = db.training_for_fewshot(spec, novel_num=5)
        assert L.NOISE_LABEL not in data
        for label, recs in data.items():
            if label in spec.train_labels:
                assert len(recs) == 6
            else:
                assert len(recs) == 5  # truncated from 8

    def test_moment_db(self, tiny_arv):
        db = schema.load_moment_db(tiny_arv["moment_path"])
        assert len(db.nonnoise_queries()) == len(db.query) - 1
        assert all(g.annotations for g in db.gallery)

    def test_word_embeddings(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        spec = tiny_arv["spec"]
        c2i = db.cls2int(spec, novel_num=5)
        mem = schema.load_word_embeddings(
            tiny_arv["embed_path"], c2i, tiny_arv["nclass"], dim=tiny_arv["embed_dim"]
        )
        norms = np.linalg.norm(mem, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_semantic_dim_inference(self):
        assert schema.infer_semantic_dim("wordembed_glove_d200.json") == 200
        assert schema.infer_semantic_dim("wordembed_elmo_d1024.json") == 1024
        assert schema.infer_semantic_dim("wordembed_fasttext_d300.json") == 300
        # custom dims: d2000 must not false-match upstream's d200 substring,
        # and the d2 inside word2vec must not match as a token
        assert schema.infer_semantic_dim("wordembed_synth_d2000.json") == 2000
        assert schema.infer_semantic_dim("wordembed_word2vec_d300.json") == 300
        assert schema.infer_semantic_dim("/data/d300/wordembed_x.json") == 300
        # right-delimited fallback: dim token glued to an alnum prefix
        assert schema.infer_semantic_dim("glove6Bd512.json") == 512
        # no dim token at all must fail loudly, not match word2vec's d2
        import pytest

        with pytest.raises(ValueError):
            schema.infer_semantic_dim("word2vec.json")


class TestClipsAndTriplets:
    def test_read_clip_shapes(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        rec = db.flat("validation")[0]
        store = SyntheticFrameStore()
        clip = read_clip_normalized(store, rec, out_frames=8, crop_size=64)
        assert clip.shape == (8, 64, 64, 3)
        assert clip.dtype == np.float32

    def test_triplet_batch(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        ds = TripletDataset(
            db,
            tiny_arv["spec"],
            SyntheticFrameStore(),
            novel_num=5,
            train_frames=4,
            crop_size=64,
            nclass=tiny_arv["nclass"],
        )
        rng = np.random.default_rng(0)
        batch = ds.build_batch(rng, batch_size=3)
        assert batch.clips.shape == (9, 4, 64, 64, 3)  # host-cropped
        assert batch.clips.dtype == np.uint8
        assert batch.labels.shape == (9,)
        # anchor/positive share a label, negative differs
        for t in range(3):
            a, p, n = batch.labels[3 * t : 3 * t + 3]
            assert a == p and n != a

    def test_prefetch_loader(self, tiny_arv):
        db = schema.load_trimmed_db(tiny_arv["db_path"])
        ds = TripletDataset(
            db,
            tiny_arv["spec"],
            SyntheticFrameStore(),
            novel_num=5,
            train_frames=4,
            crop_size=64,
            nclass=tiny_arv["nclass"],
        )
        loader = PrefetchLoader(ds, batch_size=2, steps_per_epoch=5, workers=2, seed=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 5
        assert all(b.clips.shape == (6, 4, 64, 64, 3) for b in batches)

    def test_packed_store_roundtrip(self, tmp_path):
        from vqwild_tpu.data.frames import PackedFrameStore

        import json as _json
        import numpy as np

        # build a packed store directly
        root = str(tmp_path)
        frames_a = np.random.default_rng(0).integers(0, 255, (5, 8, 9, 3), dtype=np.uint8)
        frames_b = np.random.default_rng(1).integers(0, 255, (3, 8, 9, 3), dtype=np.uint8)
        with open(f"{root}/training.bin", "wb") as f:
            f.write(frames_a.tobytes())
            f.write(frames_b.tobytes())
        with open(f"{root}/training.json", "w") as f:
            _json.dump(
                {
                    "vidA": {"offset": 0, "n": 5, "h": 8, "w": 9},
                    "vidB": {"offset": 5, "n": 3, "h": 8, "w": 9},
                },
                f,
            )
        store = PackedFrameStore(root)
        assert store.has_video("training", "vidA")
        assert store.num_frames("training", "vidB") == 3
        np.testing.assert_array_equal(
            store.read_frames("training", "vidB", np.array([1, 3])),
            frames_b[[0, 2]],
        )


class TestScaledResize:
    def test_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from vqwild_tpu.data.transforms import scaled_resize

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (3, 20, 30, 3), np.uint8)
        out = scaled_resize(frames, 16)
        assert out.shape == (3, 16, 16, 3)
        want = np.stack([cv2.resize(f, dsize=(16, 16)) for f in frames])
        np.testing.assert_array_equal(out, want)

    def test_identity_size(self):
        from vqwild_tpu.data.transforms import scaled_resize

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (2, 8, 8, 3), np.uint8)
        np.testing.assert_array_equal(scaled_resize(frames, 8), frames)


class _SmoothStore:
    """Deterministic chroma-smooth frames (no uint8 wrap discontinuities —
    SyntheticFrameStore's hash-seeded content wraps mod 256, which makes the
    lossy 4:2:0 roundtrip tolerance PYTHONHASHSEED-dependent)."""

    def __init__(self, num_frames=6, h=16, w=21):
        self.n, self.h, self.w = num_frames, h, w

    def has_video(self, subset, video_id):
        return True

    def num_frames(self, subset, video_id):
        return self.n

    def read_frames(self, subset, video_id, indices):
        idx = np.asarray(indices).reshape(-1).astype(np.int64)
        gy, gx = np.mgrid[0 : self.h, 0 : self.w].astype(np.float32)
        base = 60.0 + 10.0 * (idx[:, None, None, None] % 7)
        plane = (gy * 3 + gx * 2)[None, :, :, None]
        chan = np.arange(3, dtype=np.float32) * 15.0
        return np.clip(base + plane + chan, 0, 255).astype(np.uint8)


class TestPackedYUV420Store:
    def _mk(self, tmp_path):
        from vqwild_tpu.data.frames import PackedYUV420FrameStore

        src = _SmoothStore(num_frames=6, h=16, w=21)  # odd width → pad
        PackedYUV420FrameStore.pack_from_store(
            src, str(tmp_path), subsets=("training",),
            video_ids={"training": ["vidA", "vidB"]},
        )
        return src, PackedYUV420FrameStore(str(tmp_path))

    def test_pack_and_read_yuv(self, tmp_path):
        src, store = self._mk(tmp_path)
        assert store.has_video("training", "vidA")
        assert not store.has_video("training", "vidZ")
        assert store.num_frames("training", "vidB") == 6
        assert store.real_dims("training") == (16, 21)
        y, uv = store.read_frames_yuv("training", "vidA", np.array([1, 4]))
        assert y.shape == (2, 16, 22)  # width padded to even
        assert uv.shape == (2, 8, 11, 2)

    def test_rgb_fallback_close_to_source(self, tmp_path):
        src, store = self._mk(tmp_path)
        got = store.read_frames("training", "vidA", np.array([2, 5]))
        want = src.read_frames("training", "vidA", np.array([2, 5]))
        assert got.shape == want.shape == (2, 16, 21, 3)
        # 4:2:0 roundtrip on synthetic gradients: small mean error
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 4.0

    def test_disk_is_half_of_rgb(self, tmp_path):
        import os

        _, store = self._mk(tmp_path)
        ybytes = os.path.getsize(tmp_path / "training.y.bin")
        uvbytes = os.path.getsize(tmp_path / "training.uv.bin")
        rgb_bytes = 2 * 6 * 16 * 22 * 3  # two videos, padded dims
        assert ybytes + uvbytes == rgb_bytes // 2

    def test_read_clip_yuv_matches_rgb_reader_crop(self, tmp_path):
        from vqwild_tpu.data.clips import (
            batch_cropped_clips,
            batch_cropped_clips_yuv,
            read_clip_raw,
            read_clip_yuv,
        )
        from vqwild_tpu.data.schema import VideoRecord
        from vqwild_tpu.ops.preprocess import rgb_to_yuv420_host

        _, store = self._mk(tmp_path)
        rec = VideoRecord(
            video_id="vidA", label="x", segment=(0.0, 2.0), border=(0.0, 2.0),
            activitynet_subset="training", activitynet_duration=2.0,
        )
        c_rgb = read_clip_raw(store, rec, 4, crop_size=8)  # center crop (even)
        c_yuv = read_clip_yuv(store, rec, 4, crop_size=8)
        assert c_rgb.crop == c_yuv.crop
        y, uv = batch_cropped_clips_yuv([c_yuv], 8)
        # the RGB reader goes through the store's yuv→rgb fallback; packing
        # its crop back to 4:2:0 must reproduce the stored planes exactly
        # (crop offsets are even, conversions are deterministic inverses
        # composed on the same data)
        ey, euv = rgb_to_yuv420_host(batch_cropped_clips([c_rgb]))
        assert y.shape == ey.shape and uv.shape == euv.shape
        # Y plane roundtrips within rounding; chroma within subsample error
        assert np.abs(y.astype(int) - ey.astype(int)).max() <= 2
        assert np.abs(uv.astype(int) - euv.astype(int)).mean() < 2.0
