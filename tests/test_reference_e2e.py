"""END-TO-END differential parity: the reference's OWN evaluator classes.

Runs upstream's ``ARV_Retrieval`` (dataloader_baseline.py:1383-1616),
``ARV_Retrieval_Clip`` (:661-963) and ``ARV_Retrieval_Moment`` (:965-1380)
next to our ``ARVRetrievalTrimmed/Clip/Moment`` on identical inputs and
asserts the full metric dicts match. Two tiers:

Tier 1 — a synthetic ARV world with REAL JPEG frames on disk. Both stacks
read the same ``image_%05d.jpg`` trees and embed with the same
deterministic per-frame toy embedder (a pure function of the cropped
uint8 pixels), so the differential covers the complete pipelines: frame
IO, 1-based clamp + repeat/linspace sampling, CenterCrop, long-video
chunking + tape concatenation, clip ``cal_label`` full-coverage labeling,
moment enumeration boundaries, FAISS(-stub) vs XLA ranking, per-video
cluster NMS, ignore/self-exclusion, and metric aggregation.

Tier 2 — the real shipped ``arv_db_100_20_80.json`` testing split
(subsampled), with identical seeded features injected through each
stack's native cache path (upstream ``feat_cache.pkl`` + forced
``read_cache_feat``, main.py:552; our npz feature cache).

Upstream's third-party dependencies are satisfied functionally: faiss's
``IndexFlatL2`` is a ~15-line numpy brute-force stub (squared-L2,
ascending), torchvision's ``ToTensor/Normalize/Compose`` are faithful
reimplementations, and ``multiprocessing.cpu_count`` is patched so the
moment pool spawns >0 workers on this 1-CPU host (cpu_count()//4 == 0
would deadlock upstream's ranking, dataloader_baseline.py:1334).
"""

import json
import os
import sys
import types
import zlib
from argparse import Namespace

import numpy as np
import pytest

REF_ROOT = "/root/reference"
FEAT_DIM = 16
TEST_FRAMES = 8
INPUT_SIZE = 112
BATCH = 5

# ---------------------------------------------------------------------------
# upstream dependency stubs (functional, not import-only)
# ---------------------------------------------------------------------------


class _IndexFlatL2:
    """numpy brute-force replacement for faiss.IndexFlatL2: add/search with
    SQUARED L2 distances ascending, ties in index order (stable sort)."""

    def __init__(self, d):
        self.d = d
        self._chunks = []

    def add(self, x):
        self._chunks.append(np.asarray(x, np.float32))

    @property
    def xb(self):
        return np.concatenate(self._chunks, axis=0)

    @property
    def ntotal(self):
        return 0 if not self._chunks else self.xb.shape[0]

    def search(self, q, k):
        q = np.asarray(q, np.float32)
        xb = self.xb
        d2 = ((q[:, None, :] - xb[None]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d2, idx, axis=1).astype(np.float32), idx


def _install_functional_stubs():
    import torch

    faiss = sys.modules.get("faiss")
    if faiss is None:
        faiss = types.ModuleType("faiss")
        sys.modules["faiss"] = faiss
    faiss.IndexFlatL2 = _IndexFlatL2  # upgrade import-only stubs too

    try:
        import torchvision  # noqa: F401  pragma: no cover - not in this env
        return
    except ImportError:
        pass
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    tvt = tv.transforms

    class ToTensor:
        def __call__(self, pic):  # PIL RGB -> float CHW in [0,1]
            arr = np.asarray(pic, np.uint8).astype(np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1))

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
            self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tvt.ToTensor, tvt.Normalize, tvt.Compose = ToTensor, Normalize, Compose
    tv.get_image_backend = lambda: "PIL"


# ---------------------------------------------------------------------------
# shared deterministic toy embedder (pure function of cropped uint8 pixels)
# ---------------------------------------------------------------------------

_W3 = np.random.default_rng(7).normal(size=(3, FEAT_DIM))
_IMNET_MEAN = np.array([0.485, 0.456, 0.406])
_IMNET_STD = np.array([0.229, 0.224, 0.225])


def _embed_u8(clips_u8) -> np.ndarray:
    """[B,T,H,W,3] uint8 -> [B,FEAT_DIM,T] per-frame embeddings (f2f-like:
    frame t depends only on frame t's pixels)."""
    x = np.asarray(clips_u8).astype(np.float64) / 255.0
    m = x.mean(axis=(2, 3))  # [B,T,3]
    z = m @ _W3
    f = np.sin(5.0 * z) + 0.1 * z
    return np.transpose(f, (0, 2, 1)).astype(np.float32)


def _ref_feat_fn(images) -> np.ndarray:
    """Upstream feat_extract_func: receives ImageNet-normalized float
    [B,T,H,W,C] (read_video, utils_dataset.py:104-124); invert the exact
    normalization to recover the uint8 pixels, then embed identically."""
    x = images.numpy() if hasattr(images, "numpy") else np.asarray(images)
    u8 = np.clip(np.rint((x * _IMNET_STD + _IMNET_MEAN) * 255.0), 0, 255)
    return _embed_u8(u8.astype(np.uint8))


def _our_feat_fn(clips_u8) -> np.ndarray:
    """Our FeatureExtractor feat_fn: receives cropped uint8 directly."""
    return _embed_u8(clips_u8)


def _seeded_feat(key: str) -> np.ndarray:
    """Tier-2 injected feature for one record, keyed by identity."""
    rng = np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)
    return rng.normal(size=FEAT_DIM).astype(np.float32)


# ---------------------------------------------------------------------------
# synthetic world (labels + DBs + JPEG frames)
# ---------------------------------------------------------------------------

TRAIN_LABELS = ["base0", "base1", "base2", "base3"]
VAL_LABELS = ["valA", "valB"]
TEST_LABELS = ["novA", "novB"]
NOISE = "distractor_activity"

GALLERY_VIDEOS = [
    # (video_id, duration, [(seg0, seg1, label), ...])
    ("g0", 31.7, [(2.0, 15.5, "base0"), (20.0, 30.0, "base1")]),
    ("g1", 44.2, [(0.0, 18.0, "base2"), (25.0, 40.0, "novA")]),
    ("g2", 38.9, [(5.0, 25.0, "base3"), (26.0, 38.0, "valA")]),
    ("g3", 52.3, [(3.0, 30.0, "novB"), (31.0, 50.0, "base0")]),
    ("g4", 36.1, [(0.0, 20.0, "base1"), (10.0, 30.0, "base2")]),
    ("g5", 47.8, [(4.5, 22.0, "novA"), (22.0, 45.0, "novB")]),
    ("g6", 29.4, []),
    ("g7", 41.6, [(1.0, 14.0, "base3"), (15.0, 39.0, "base0")]),
]

MOMENT_QUERIES = [
    ("base0", "g0", (3.0, 15.0)),
    ("base0", "g3", (32.0, 49.0)),
    ("base0", "g7", (16.0, 38.5)),
    ("base1", "g0", (20.5, 29.5)),
    ("base1", "g4", (0.5, 19.0)),
    ("base2", "g1", (0.5, 17.5)),
    ("base2", "g4", (11.0, 29.0)),
    ("base3", "g2", (5.5, 24.5)),
    ("base3", "g7", (1.5, 13.5)),
    ("novA", "g1", (25.5, 39.5)),
    ("novA", "g5", (5.0, 21.5)),
    ("novB", "g3", (3.5, 29.5)),
    ("novB", "g5", (22.5, 44.5)),
    (NOISE, "g6", (2.0, 12.0)),  # filtered by load_data on both sides
]


def _write_frames(root, subset, video_id, n_frames):
    d = os.path.join(root, subset, video_id)
    os.makedirs(d, exist_ok=True)
    from PIL import Image

    for i in range(1, n_frames + 1):
        rng = np.random.default_rng(zlib.crc32(f"{video_id}:{i}".encode()))
        blocks = rng.integers(0, 256, size=(8, 11, 3), dtype=np.uint8)
        frame = np.kron(blocks, np.ones((16, 16, 1), np.uint8))[:128, :171]
        Image.fromarray(frame).save(
            os.path.join(d, "image_{:05d}.jpg".format(i)), quality=90
        )


@pytest.fixture(scope="module")
def ref_env():
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference mount unavailable")
    pytest.importorskip("sklearn")
    pytest.importorskip("scipy")
    _install_functional_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        import dataloader_baseline as mod
    except Exception as e:  # pragma: no cover - env-specific
        pytest.skip(f"reference import failed: {e}")
    import multiprocessing

    orig_cpu_count = multiprocessing.cpu_count
    multiprocessing.cpu_count = lambda: 8  # else cpu_count()//4==0 deadlocks
    yield mod
    multiprocessing.cpu_count = orig_cpu_count


@pytest.fixture(scope="module")
def world(ref_env, tmp_path_factory):
    """Synthetic DBs + frames; registers the split with BOTH stacks."""
    root = tmp_path_factory.mktemp("refworld")
    frames_root = str(root / "frames")

    def trimmed_rec(video_id, label, rtype, is_query, dur, seg):
        return dict(
            video_id=video_id,
            label=label,
            retrieval_type=rtype,
            is_query=is_query,
            segment=list(seg),
            border=[max(0.0, seg[0] - 1.5), min(dur, seg[1] + 1.5)],
            activitynet_duration=dur,
            activitynet_subset="validation",
        )

    rng = np.random.default_rng(11)
    testing = {}
    for ci, label in enumerate(TRAIN_LABELS + TEST_LABELS + VAL_LABELS):
        n = 2 if label in VAL_LABELS else 3
        rtype = "base" if label in TRAIN_LABELS else "novel"
        recs = []
        for k in range(n):
            dur = float(np.round(12.0 + rng.uniform(0, 8), 1))
            s0 = float(np.round(rng.uniform(1.0, 3.0), 1))
            s1 = float(np.round(s0 + rng.uniform(4.0, min(9.0, dur - s0 - 1)), 1))
            recs.append(
                trimmed_rec(f"tv_{label}_{k}", label, rtype, 1, dur, (s0, s1))
            )
        testing[label] = recs
    testing[NOISE] = [
        trimmed_rec(f"tv_noise_{k}", NOISE, "noise", -1, 15.0, (2.0, 9.0))
        for k in range(4)
    ]
    trimmed_db = {"training": {}, "validation": {}, "testing": testing}

    gallery = [
        dict(
            video_id=vid,
            segment=[0.0, dur],
            border=[0.0, dur],
            activitynet_duration=dur,
            activitynet_subset="validation",
            annotations=[
                dict(segment=[a, b], label=lab) for a, b, lab in anns
            ],
        )
        for vid, dur, anns in GALLERY_VIDEOS
    ]
    queries = [
        dict(
            video_id=vid,
            label=label,
            retrieval_type=(
                "noise"
                if label == NOISE
                else ("base" if label in TRAIN_LABELS else "novel")
            ),
            segment=list(seg),
            border=list(seg),
            activitynet_duration=dict(
                (v, d) for v, d, _ in GALLERY_VIDEOS
            )[vid],
            activitynet_subset="validation",
        )
        for label, vid, seg in MOMENT_QUERIES
    ]
    moment_db = {"query": queries, "gallery": gallery}

    trimmed_path = str(root / "arv_db_synthetic.json")
    moment_path = str(root / "arv_db_synthetic_untrimmed.json")
    json.dump(trimmed_db, open(trimmed_path, "w"))
    json.dump(moment_db, open(moment_path, "w"))

    for label, recs in testing.items():
        for r in recs:
            _write_frames(
                frames_root,
                "validation",
                r["video_id"],
                int(r["activitynet_duration"] * 3),
            )
    for vid, dur, _ in GALLERY_VIDEOS:
        _write_frames(frames_root, "validation", vid, int(dur * 3))

    # upstream registration: split entry + frames root + logger dir
    from misc_utils import pytorchgo_logger as ref_logger
    from misc_utils import utils_dataset as ref_ud

    ref_ud.dataset_config["synthetic"] = dict(
        arv_train_label=list(TRAIN_LABELS),
        arv_val_label=list(VAL_LABELS),
        arv_test_label=list(TEST_LABELS),
        activitynet_label_list=TRAIN_LABELS + VAL_LABELS + TEST_LABELS,
        json_path=trimmed_path,
        moment_eval_json_path=moment_path,
    )
    orig_path = ref_ud.activtynet_fps3_path
    ref_ud.activtynet_fps3_path = frames_root
    ref_env.activtynet_fps3_path = frames_root
    log_dir = str(root / "ref_log")
    ref_logger.set_logger_dir(log_dir, action="d")

    from vqwild_tpu.data.labels import SplitSpec

    spec = SplitSpec(
        name="synthetic",
        train_labels=tuple(TRAIN_LABELS),
        val_labels=tuple(VAL_LABELS),
        test_labels=tuple(TEST_LABELS),
        db_json=trimmed_path,
        moment_db_json=moment_path,
    )
    yield dict(
        root=str(root),
        frames_root=frames_root,
        trimmed_path=trimmed_path,
        moment_path=moment_path,
        spec=spec,
        log_dir=log_dir,
    )
    del ref_ud.dataset_config["synthetic"]
    ref_ud.activtynet_fps3_path = orig_path
    ref_env.activtynet_fps3_path = orig_path


def _ref_args(**over):
    base = dict(
        meta_split="synthetic",
        eval_split="testing",
        test_batch_size=BATCH,
        input_size=INPUT_SIZE,
        test_frame_num=TEST_FRAMES,
        metric_feat_dim=FEAT_DIM,
        memory_leak_debug=False,
        query_num=1,
        read_cache_feat=False,
        debug=False,
        workers=0,
        temporal_stride=1,
        clip_sec=6,
        evaluate=True,
    )
    base.update(over)
    return Namespace(**base)


def _our_extractor(world, cache_dir=None):
    from vqwild_tpu.data.frames import JpegDirFrameStore
    from vqwild_tpu.retrieval.features import FeatureExtractor

    return FeatureExtractor(
        _our_feat_fn,
        JpegDirFrameStore(world["frames_root"]),
        test_frames=TEST_FRAMES,
        test_batch_size=BATCH,
        input_size=INPUT_SIZE,
        fps=3,
        cache_dir=cache_dir,
    )


def _assert_results_match(ref, ours, atol=5e-5):
    for key in ("ap", "base_map", "novel_map"):
        assert abs(float(ref[key]) - float(ours[key])) < atol, (
            key,
            ref[key],
            ours[key],
        )
    for rkey in ("recall", "base_recall", "novel_recall"):
        for n in ("30", "50", "100"):
            assert abs(float(ref[rkey][n]) - float(ours[rkey][n])) < atol, (
                rkey,
                n,
                ref[rkey][n],
                ours[rkey][n],
            )
    ref_cls = ref["cm_dict"]["class_map_dict"]
    our_cls = ours["class_map_dict"]
    assert set(ref_cls) == set(our_cls)
    for c in ref_cls:
        assert abs(float(ref_cls[c]) - float(our_cls[c])) < atol, (
            c,
            ref_cls[c],
            our_cls[c],
        )


# ---------------------------------------------------------------------------
# Tier 1: full-pipeline differentials on the synthetic world
# ---------------------------------------------------------------------------


class TestTrimmedEndToEnd:
    def test_full_pipeline_matches_reference(self, ref_env, world):
        ref = ref_env.ARV_Retrieval(_ref_args(), _ref_feat_fn).evaluation()

        from vqwild_tpu.data.schema import load_trimmed_db
        from vqwild_tpu.retrieval.trimmed import ARVRetrievalTrimmed

        ours = ARVRetrievalTrimmed(
            load_trimmed_db(world["trimmed_path"]),
            world["spec"],
            _our_extractor(world),
            eval_split="testing",
            collect_diagnostics=True,
        ).evaluation()
        _assert_results_match(ref, ours)

        # cm_dict diagnostics: the system-level y_true/y_pred streams
        # (ignore-filtered, robust-flipped, concatenated in query order)
        ref_sys = ref["cm_dict"]["system_ap_dict"]
        our_sys = ours["cm_dict"]["system_ap_dict"]
        for key in ("y_true", "base_y_true", "novel_y_true"):
            np.testing.assert_array_equal(
                np.asarray(our_sys[key]), np.asarray(ref_sys[key]), err_msg=key
            )
        for key in ("y_pred", "base_y_pred", "novel_y_pred"):
            np.testing.assert_allclose(
                np.asarray(our_sys[key], np.float64),
                np.asarray(ref_sys[key], np.float64),
                atol=1e-4,
                err_msg=key,
            )
        # confusion-matrix label streams and top-30 payload sizes
        assert ours["cm_dict"]["gt_labels"] == ref["cm_dict"]["gt_labels"]
        assert ours["cm_dict"]["label"] == ref["cm_dict"]["label"]
        assert len(ours["cm_dict"]["top30_result_list"]) == len(
            ref["cm_dict"]["top30_result_list"]
        )


class TestTrimmedMultiQueryEndToEnd:
    def test_query_num_2_matches_reference(self, ref_env, world):
        """query_num>1 averages the first N expanded query features and the
        whole 5-video expansion stays excluded (dataloader_baseline.py:
        1588-1591, :1532) — the averaging path the default leaves cold."""
        ref = ref_env.ARV_Retrieval(
            _ref_args(query_num=2), _ref_feat_fn
        ).evaluation()

        from vqwild_tpu.data.schema import load_trimmed_db
        from vqwild_tpu.retrieval.trimmed import ARVRetrievalTrimmed

        ours = ARVRetrievalTrimmed(
            load_trimmed_db(world["trimmed_path"]),
            world["spec"],
            _our_extractor(world),
            eval_split="testing",
            query_num=2,
            collect_diagnostics=True,
        ).evaluation()
        _assert_results_match(ref, ours)


class TestClipEndToEnd:
    def test_full_pipeline_matches_reference(self, ref_env, world):
        ref = ref_env.ARV_Retrieval_Clip(_ref_args(), _ref_feat_fn).evaluation()

        from vqwild_tpu.data.schema import load_moment_db
        from vqwild_tpu.retrieval.clip import ARVRetrievalClip

        ours = ARVRetrievalClip(
            load_moment_db(world["moment_path"]),
            world["spec"],
            _our_extractor(world),
            clip_sec=6,
            check_completeness=False,
            collect_diagnostics=True,
        ).evaluation()
        _assert_results_match(ref, ours)


class TestMomentEndToEnd:
    def test_full_pipeline_matches_reference(self, ref_env, world):
        ref = ref_env.ARV_Retrieval_Moment(
            _ref_args(), _ref_feat_fn
        ).evaluation()

        from vqwild_tpu.data.schema import load_moment_db
        from vqwild_tpu.retrieval.moment import ARVRetrievalMoment

        ours = ARVRetrievalMoment(
            load_moment_db(world["moment_path"]),
            world["spec"],
            _our_extractor(world),
            workers=2,
        ).evaluation()
        _assert_results_match(ref["map05"], ours["map05"])


# ---------------------------------------------------------------------------
# Tier 2: real shipped DB (subsampled), identical injected features
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def real_slice(ref_env, tmp_path_factory):
    """Subsample arv_db_100_20_80.json's testing split: 20 classes x <=6
    records + 40 noise records, key/record order preserved (order drives
    the seed-620 multi-query RNG on both sides)."""
    root = tmp_path_factory.mktemp("realslice")
    src = os.path.join(REF_ROOT, "data_generate", "arv_db_100_20_80.json")
    raw = json.load(open(src))
    from misc_utils.utils_dataset import dataset_config

    cfg = dataset_config["100_20_80"]
    possible = set(cfg["arv_train_label"] + cfg["arv_test_label"])

    keep_classes = []
    testing = {}
    for label, recs in raw["testing"].items():
        if label == NOISE:
            testing[label] = recs[:40]
            continue
        if label not in possible or len(keep_classes) >= 20:
            continue
        sub = recs[:6]
        if len({r["video_id"] for r in sub if r.get("is_query") == 1}) < 2:
            continue  # multi-query needs >=2 distinct query videos
        keep_classes.append(label)
        testing[label] = sub
    assert len(keep_classes) == 20
    db = {"training": {}, "validation": {}, "testing": testing}
    path = str(root / "arv_db_slice.json")
    json.dump(db, open(path, "w"))

    # upstream-order record list == iteration over the split dict
    records = [r for recs in testing.values() for r in recs]
    feats = {
        (r["video_id"], tuple(np.round(r["segment"], 3))): _seeded_feat(
            "{}|{:.3f}|{:.3f}".format(
                r["video_id"], r["segment"][0], r["segment"][1]
            )
        )
        for r in records
    }
    return dict(root=str(root), path=path, records=records, feats=feats)


class TestTrimmedRealDBInjected:
    def test_real_db_slice_matches_reference(self, ref_env, world, real_slice):
        import pickle

        from misc_utils import pytorchgo_logger as ref_logger
        from misc_utils.utils_dataset import dataset_config

        def feat_of(r):
            return real_slice["feats"][
                (r["video_id"], tuple(np.round(r["segment"], 3)))
            ]

        cfg = dataset_config["100_20_80"]
        possible = set(cfg["arv_train_label"] + cfg["arv_test_label"])
        gallery_list = []
        for r in real_slice["records"]:
            rec = dict(r)
            rec["feat"] = feat_of(r)
            rec["frame_info"] = dict(
                frame_path="", frame_num=0, start_frame_idx=0
            )
            gallery_list.append(rec)
        query_list = [g for g in gallery_list if g["label"] in possible]
        cache = os.path.join(ref_logger.get_logger_dir(), "feat_cache.pkl")
        with open(cache, "wb") as fp:
            pickle.dump(
                dict(query_list=query_list, gallery_list=gallery_list), fp
            )
        try:
            orig_json = cfg["json_path"]
            cfg["json_path"] = real_slice["path"]
            args = _ref_args(meta_split="100_20_80", read_cache_feat=True)
            ref = ref_env.ARV_Retrieval(args, _ref_feat_fn).evaluation()
        finally:
            cfg["json_path"] = orig_json
            os.remove(cache)

        from vqwild_tpu.data.labels import get_split
        from vqwild_tpu.data.schema import load_trimmed_db
        from vqwild_tpu.retrieval.trimmed import ARVRetrievalTrimmed

        db = load_trimmed_db(real_slice["path"])
        cache_dir = os.path.join(real_slice["root"], "ours")
        extractor = _our_extractor(world, cache_dir=cache_dir)
        our_records = db.flat("testing")
        assert [r.video_id for r in our_records] == [
            r["video_id"] for r in real_slice["records"]
        ], "record order must match upstream's dict-iteration order"
        feats = np.stack(
            [
                real_slice["feats"][
                    (r.video_id, tuple(np.round(r.segment, 3)))
                ]
                for r in our_records
            ]
        )
        extractor.save_cache("trimmed_testing_feats.npz", feats=feats)
        ours = ARVRetrievalTrimmed(
            db,
            get_split("100_20_80"),
            extractor,
            eval_split="testing",
            read_cache=True,
            collect_diagnostics=True,
        ).evaluation()
        _assert_results_match(ref, ours)


# ---------------------------------------------------------------------------
# Tier 2b: real untrimmed DB (subsampled) — clip + moment evaluators, with
# upstream's frame IO virtualized (no frames exist for the real videos).
# ---------------------------------------------------------------------------
#
# The frame-dependent pieces (JPEG decode, sampling policy, CenterCrop) are
# differentially covered by Tier 1 with real frames; here they are replaced
# by a shared deterministic frame-value convention so the REAL durations,
# annotation distributions, and boundary cases of arv_db_100_20_80_untrimmed
# drive upstream's chunking, garner/cal_label windowing, moment enumeration,
# NMS and metrics against ours. Upstream's read_activitynet/read_video are
# monkeypatched to the convention (frame count = int(duration*3), frame i of
# video v = crc32("v:i") bytes); our stack consumes the same convention
# through a FrameStore, running its REAL read/sample/crop/chunk path.


def _frame_value(video_id: str, idx: int) -> np.ndarray:
    h = zlib.crc32(f"{video_id}:{idx}".encode())
    return np.array([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF], np.uint8)


@pytest.fixture(scope="module")
def real_untrimmed_slice(ref_env, tmp_path_factory):
    root = tmp_path_factory.mktemp("realuslice")
    src = os.path.join(
        REF_ROOT, "data_generate", "arv_db_100_20_80_untrimmed.json"
    )
    raw = json.load(open(src))
    from misc_utils.utils_dataset import dataset_config

    cfg = dataset_config["100_20_80"]
    possible = set(cfg["arv_train_label"] + cfg["arv_test_label"])

    # choose queries first (classes with >=2 distinct query videos — the
    # multi-query expansion requires it), then build the gallery from those
    # videos plus unrelated padding videos
    by_label = {}
    for q in raw["query"]:
        if q["retrieval_type"] == "noise" or q["label"] not in possible:
            continue
        by_label.setdefault(q["label"], []).append(q)
    queries = []
    for label, qs in sorted(by_label.items())[:8]:
        if len({q["video_id"] for q in qs}) >= 2:
            queries.extend(qs[:4])
    assert len(queries) >= 20, len(queries)
    q_vids = {q["video_id"] for q in queries}
    by_id = {g["video_id"]: g for g in raw["gallery"]}
    gallery = [by_id[v] for v in sorted(q_vids) if v in by_id]
    for g in raw["gallery"]:
        if len(gallery) >= 70:
            break
        if g["video_id"] not in q_vids:
            gallery.append(g)

    # Upstream's class-completeness asserts (dataloader_baseline.py:862-870,
    # :1186-1194) require EVERY possible class to appear covered in the
    # gallery — unattainable for a slice of the 180-class universe. The
    # label partition is config (dataset_config), so restrict it (on both
    # stacks) to the classes this slice actually covers: a clip-covering
    # annotation for the clip assert, any allowed annotation for moment's.
    def covers_clip(ann, dur):
        a, b = ann["segment"]
        for start in range(0, int(dur), 6):  # clip_sec=6 grid
            if a <= start and b >= start + 6:
                return True
        return False

    covered_clip = set()
    for g in gallery:
        for ann in g["annotations"]:
            if ann["label"] in possible and covers_clip(
                ann, g["activitynet_duration"]
            ):
                covered_clip.add(ann["label"])

    def iou(a0, a1, b0, b1):
        ov = max(0.0, min(a1, b1) - max(a0, b0))
        return ov / (max(a1, b1) - min(a0, b0))

    # classes that win at least one moment's closest-hit argmax (coarse
    # simulation of the 5s x 1..26-clip grid) — moment's completeness assert
    def moment_winners(g, allowed):
        dur = int(g["activitynet_duration"])
        anns = [a for a in g["annotations"] if a["label"] in allowed]
        winners = set()
        for n in range(1, 27):
            span = 5 * n
            for s in range(0, dur - span, 5):
                best, best_i = None, -1.0
                for a in anns:
                    i = iou(a["segment"][0], a["segment"][1], s, s + span)
                    if i > best_i:
                        best, best_i = a["label"], i
                if best is not None:
                    winners.add(best)
        return winners

    covered_m = set()
    for g in gallery:
        covered_m |= moment_winners(g, covered_clip)
    covered = covered_clip & covered_m
    train_r = [l for l in cfg["arv_train_label"] if l in covered]
    test_r = [l for l in cfg["arv_test_label"] if l in covered]
    queries = [q for q in queries if q["label"] in covered]
    q_classes = {}
    for q in queries:
        q_classes.setdefault(q["label"], set()).add(q["video_id"])
    queries = [q for q in queries if len(q_classes[q["label"]]) >= 2]
    assert len(queries) >= 15, len(queries)

    path = str(root / "arv_db_untrimmed_slice.json")
    json.dump({"query": queries, "gallery": gallery}, open(path, "w"))

    durations = {
        r["video_id"]: r["activitynet_duration"]
        for r in gallery + queries
    }
    return dict(
        root=str(root),
        path=path,
        durations=durations,
        train_labels=train_r,
        test_labels=test_r,
    )


@pytest.fixture()
def virtual_frames(ref_env, real_untrimmed_slice):
    """Patch upstream's frame IO to the shared frame-value convention."""
    import torch

    durations = real_untrimmed_slice["durations"]

    def fake_read_activitynet(video_dict):
        n = max(1, int(durations[video_dict["video_id"]] * 3))
        start = int(video_dict["segment"][0] * 3)
        frames = int(
            (video_dict["segment"][1] - video_dict["segment"][0]) * 3
        )
        return start, frames, "VIRT/" + video_dict["video_id"], n

    def fake_read_video(start_frame_idx, gt_frame_num, train_frame_num,
                        video_transform, frame_path, activitynet_frame_num):
        video_id = frame_path.split("/", 1)[1]

        def read_img(loc):
            ii = int(np.floor(loc))
            ii = 1 if ii <= 0 else ii
            ii = activitynet_frame_num if ii > activitynet_frame_num else ii
            v = _frame_value(video_id, ii).astype(np.float32) / 255.0
            frame = np.broadcast_to(
                v, (INPUT_SIZE, INPUT_SIZE, 3)
            ).astype(np.float32)
            return (frame - _IMNET_MEAN) / _IMNET_STD

        images = []
        if gt_frame_num < train_frame_num:
            for i in range(train_frame_num):
                idd = start_frame_idx + (i % gt_frame_num) + 1
                images.append(read_img(idd))
        else:
            for loc in np.linspace(
                start_frame_idx,
                start_frame_idx + gt_frame_num - 1,
                num=train_frame_num,
            ):
                images.append(read_img(loc))
        images = np.stack(images).astype(np.float32)
        if video_transform is not None:
            images = video_transform(images)
        return images

    saved = (ref_env.read_activitynet, ref_env.read_video)
    ref_env.read_activitynet = fake_read_activitynet
    ref_env.read_video = fake_read_video
    yield
    ref_env.read_activitynet, ref_env.read_video = saved


def _virtual_store(durations):
    from vqwild_tpu.data.frames import FrameStore

    class VirtualFrameStore(FrameStore):
        def has_video(self, subset, video_id):
            return video_id in durations

        def num_frames(self, subset, video_id):
            return max(1, int(durations[video_id] * 3))

        def read_frames(self, subset, video_id, indices):
            frames = np.empty(
                (len(indices), INPUT_SIZE, INPUT_SIZE, 3), np.uint8
            )
            for k, idx in enumerate(np.asarray(indices).reshape(-1)):
                frames[k] = _frame_value(video_id, int(idx))
            return frames

    return VirtualFrameStore()


def _our_virtual_extractor(durations):
    from vqwild_tpu.retrieval.features import FeatureExtractor

    return FeatureExtractor(
        _our_feat_fn,
        _virtual_store(durations),
        test_frames=TEST_FRAMES,
        test_batch_size=BATCH,
        input_size=INPUT_SIZE,
        fps=3,
    )


from contextlib import contextmanager


@contextmanager
def _restricted_partition(slice_):
    """Point the 100_20_80 config at the slice file with its label universe
    restricted to the slice's covered classes (both asserts + possible_classes
    derive from dataset_config, so this parametrizes BOTH stacks)."""
    from misc_utils.utils_dataset import dataset_config

    from vqwild_tpu.data.labels import SplitSpec, get_split

    cfg = dataset_config["100_20_80"]
    orig = (
        cfg["moment_eval_json_path"],
        cfg["arv_train_label"],
        cfg["arv_test_label"],
    )
    cfg["moment_eval_json_path"] = slice_["path"]
    cfg["arv_train_label"] = list(slice_["train_labels"])
    cfg["arv_test_label"] = list(slice_["test_labels"])
    full = get_split("100_20_80")
    our_spec = SplitSpec(
        name="100_20_80_slice",
        train_labels=tuple(slice_["train_labels"]),
        val_labels=full.val_labels,
        test_labels=tuple(slice_["test_labels"]),
        db_json=full.db_json,
        moment_db_json=slice_["path"],
    )
    try:
        yield our_spec
    finally:
        (
            cfg["moment_eval_json_path"],
            cfg["arv_train_label"],
            cfg["arv_test_label"],
        ) = orig


class TestClipRealDBVirtualFrames:
    def test_real_untrimmed_slice_matches_reference(
        self, ref_env, world, real_untrimmed_slice, virtual_frames
    ):
        with _restricted_partition(real_untrimmed_slice) as spec:
            args = _ref_args(meta_split="100_20_80", debug=False)
            ref = ref_env.ARV_Retrieval_Clip(args, _ref_feat_fn).evaluation()

            from vqwild_tpu.data.schema import load_moment_db
            from vqwild_tpu.retrieval.clip import ARVRetrievalClip

            ours = ARVRetrievalClip(
                load_moment_db(real_untrimmed_slice["path"]),
                spec,
                _our_virtual_extractor(real_untrimmed_slice["durations"]),
                clip_sec=6,
            ).evaluation()
        _assert_results_match(ref, ours)


class TestMomentRealDBVirtualFrames:
    def test_real_untrimmed_slice_matches_reference(
        self, ref_env, world, real_untrimmed_slice, virtual_frames
    ):
        with _restricted_partition(real_untrimmed_slice) as spec:
            args = _ref_args(meta_split="100_20_80", debug=False)
            ref = ref_env.ARV_Retrieval_Moment(args, _ref_feat_fn).evaluation()

            from vqwild_tpu.data.schema import load_moment_db
            from vqwild_tpu.retrieval.moment import ARVRetrievalMoment

            ours = ARVRetrievalMoment(
                load_moment_db(real_untrimmed_slice["path"]),
                spec,
                _our_virtual_extractor(real_untrimmed_slice["durations"]),
                workers=2,
            ).evaluation()
        _assert_results_match(ref["map05"], ours["map05"])
