"""Frame storage backends.

The reference reads per-frame JPEGs from
``data/activitynet1.3_train_val_frames_fps3/{subset}/{video_id}/image_%05d.jpg``
(utils_dataset.py:10, :77-124) and decodes with PIL inside DataLoader workers —
its known throughput bottleneck (96 JPEG decodes per triplet). We keep a
parity JPEG backend, and add:

* ``PackedFrameStore`` — frames packed as raw uint8 RGB into one flat file
  per subset with a JSON index; reads are zero-decode ``np.memmap`` gathers
  (≥10× input throughput is won here, not in the convs).
* ``PackedYUV420FrameStore`` — the production TPU-host feeding path: the
  same idea in planar 4:2:0 (half the disk), feeding the yuv420 wire format
  with zero per-batch conversion.
* ``SyntheticFrameStore`` — deterministic pseudo-frames keyed by
  (video_id, frame_idx); lets every pipeline stage run without ActivityNet on
  disk (generalizes the reference's --memory_leak_debug fake backend).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

FRAME_H, FRAME_W, FRAME_C = 128, 171, 3  # generate_frames.py:43 (171x128)


class FrameStore:
    """Interface: uint8 frame access by (subset, video_id, 1-based indices)."""

    def has_video(self, subset: str, video_id: str) -> bool:
        raise NotImplementedError

    def num_frames(self, subset: str, video_id: str) -> int:
        raise NotImplementedError

    def read_frames(
        self, subset: str, video_id: str, indices: np.ndarray
    ) -> np.ndarray:
        """[len(indices), H, W, C] uint8; indices are 1-based file numbers."""
        raise NotImplementedError


class JpegDirFrameStore(FrameStore):
    """Parity backend: PIL-decoded image_%05d.jpg trees."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, subset: str, video_id: str) -> str:
        return os.path.join(self.root, subset, video_id)

    def has_video(self, subset: str, video_id: str) -> bool:
        return os.path.isdir(self._dir(subset, video_id))

    def num_frames(self, subset: str, video_id: str) -> int:
        return len(os.listdir(self._dir(subset, video_id)))

    def read_frames(self, subset, video_id, indices):
        from PIL import Image

        d = self._dir(subset, video_id)
        frames = []
        for idx in np.asarray(indices).reshape(-1):
            path = os.path.join(d, "image_{:05d}.jpg".format(int(idx)))
            with Image.open(path) as img:
                frames.append(np.asarray(img.convert("RGB"), dtype=np.uint8))
        return np.stack(frames, axis=0)


class PackedFrameStore(FrameStore):
    """Zero-decode backend: one flat uint8 blob + index per subset.

    Layout under ``root``:
      {subset}.bin    concatenated [n_frames, H, W, C] uint8 per video
      {subset}.json   {video_id: {"offset": frame_offset, "n": n_frames,
                                   "h": H, "w": W}}
    """

    def __init__(self, root: str):
        self.root = root
        self._index: Dict[str, dict] = {}
        self._blob: Dict[str, np.memmap] = {}

    def _load_subset(self, subset: str):
        if subset in self._index:
            return
        with open(os.path.join(self.root, subset + ".json")) as f:
            self._index[subset] = json.load(f)
        meta = self._index[subset]
        any_v = next(iter(meta.values()), None)
        h = any_v["h"] if any_v else FRAME_H
        w = any_v["w"] if any_v else FRAME_W
        self._blob[subset] = np.memmap(
            os.path.join(self.root, subset + ".bin"), dtype=np.uint8, mode="r"
        ).reshape(-1, h, w, FRAME_C)

    def has_video(self, subset, video_id):
        try:
            self._load_subset(subset)
        except FileNotFoundError:
            return False
        return video_id in self._index[subset]

    def num_frames(self, subset, video_id):
        self._load_subset(subset)
        return int(self._index[subset][video_id]["n"])

    def read_frames(self, subset, video_id, indices):
        self._load_subset(subset)
        rec = self._index[subset][video_id]
        # 1-based file numbers → 0-based offsets into this video's frame block
        idx = np.asarray(indices).reshape(-1).astype(np.int64) - 1 + rec["offset"]
        return np.asarray(self._blob[subset][idx])

    @staticmethod
    def pack_from_jpeg(
        jpeg_root: str,
        out_root: str,
        subsets: Sequence[str] = ("training", "validation"),
        video_ids: Optional[Dict[str, Sequence[str]]] = None,
    ):
        """Offline converter: JPEG tree → packed blobs."""
        src = JpegDirFrameStore(jpeg_root)
        os.makedirs(out_root, exist_ok=True)
        for subset in subsets:
            subset_dir = os.path.join(jpeg_root, subset)
            vids = (
                list(video_ids[subset])
                if video_ids
                else sorted(os.listdir(subset_dir))
            )
            index = {}
            offset = 0
            with open(os.path.join(out_root, subset + ".bin"), "wb") as blob:
                dims = None
                for vid in vids:
                    n = src.num_frames(subset, vid)
                    frames = src.read_frames(subset, vid, np.arange(1, n + 1))
                    hw = (int(frames.shape[1]), int(frames.shape[2]))
                    # _load_subset reshapes the whole blob with one (h, w);
                    # mixed dims would silently corrupt every later frame.
                    if dims is None:
                        dims = hw
                    elif hw != dims:
                        raise ValueError(
                            f"mixed frame dims in {subset}: {hw} vs {dims}"
                        )
                    blob.write(frames.tobytes())
                    index[vid] = {
                        "offset": offset,
                        "n": n,
                        "h": hw[0],
                        "w": hw[1],
                    }
                    offset += n
            with open(os.path.join(out_root, subset + ".json"), "w") as f:
                json.dump(index, f)


class PackedYUV420FrameStore(FrameStore):
    """Production backend: frames stored as planar YUV 4:2:0 blobs.

    Half the disk of ``PackedFrameStore`` AND half the host→device transfer
    when paired with the yuv420 wire (ops/preprocess.py) — the source JPEGs
    are 4:2:0-subsampled, so nothing the JPEG kept is lost. Odd frame dims
    (ActivityNet fps3 frames are 128x171) are edge-padded to even in the
    blobs; the index records the real dims and crops never touch the pad
    (crop offsets stay within the real frame).

    Layout under ``root``:
      {subset}.y.bin   [N, hp, wp] uint8
      {subset}.uv.bin  [N, hp/2, wp/2, 2] uint8
      {subset}.json    {"_meta": {h, w, hp, wp}, "videos": {vid: {offset, n}}}
    """

    supports_yuv = True

    def __init__(self, root: str):
        self.root = root
        self._index: Dict[str, dict] = {}
        self._meta: Dict[str, dict] = {}
        self._y: Dict[str, np.memmap] = {}
        self._uv: Dict[str, np.memmap] = {}

    def _load_subset(self, subset: str):
        if subset in self._index:
            return
        with open(os.path.join(self.root, subset + ".json")) as f:
            doc = json.load(f)
        meta = doc["_meta"]
        self._meta[subset] = meta
        self._index[subset] = doc["videos"]
        hp, wp = meta["hp"], meta["wp"]
        self._y[subset] = np.memmap(
            os.path.join(self.root, subset + ".y.bin"), dtype=np.uint8, mode="r"
        ).reshape(-1, hp, wp)
        self._uv[subset] = np.memmap(
            os.path.join(self.root, subset + ".uv.bin"), dtype=np.uint8, mode="r"
        ).reshape(-1, hp // 2, wp // 2, 2)

    def has_video(self, subset, video_id):
        try:
            self._load_subset(subset)
        except FileNotFoundError:
            return False
        return video_id in self._index[subset]

    def num_frames(self, subset, video_id):
        self._load_subset(subset)
        return int(self._index[subset][video_id]["n"])

    def real_dims(self, subset: str):
        """(h, w) of the original frames (pre-padding)."""
        self._load_subset(subset)
        m = self._meta[subset]
        return m["h"], m["w"]

    def read_frames_yuv(self, subset, video_id, indices):
        """(Y [n, hp, wp], UV [n, hp/2, wp/2, 2]) uint8 — the zero-copy
        production read; planes include the even-padding."""
        self._load_subset(subset)
        rec = self._index[subset][video_id]
        idx = np.asarray(indices).reshape(-1).astype(np.int64) - 1 + rec["offset"]
        return np.asarray(self._y[subset][idx]), np.asarray(self._uv[subset][idx])

    def read_frames(self, subset, video_id, indices):
        """RGB-interface fallback (converts on host; prefer read_frames_yuv
        with the yuv420 wire)."""
        from vqwild_tpu.ops.preprocess import yuv420_to_rgb_host

        y, uv = self.read_frames_yuv(subset, video_id, indices)
        h, w = self.real_dims(subset)
        return yuv420_to_rgb_host(y, uv)[:, :h, :w, :]

    @staticmethod
    def pack_from_store(
        src: FrameStore,
        out_root: str,
        subsets: Sequence[str] = ("training", "validation"),
        video_ids: Optional[Dict[str, Sequence[str]]] = None,
        jpeg_root: Optional[str] = None,
    ):
        """Offline converter: any FrameStore → YUV420 blobs."""
        from vqwild_tpu.ops.preprocess import rgb_to_yuv420_host

        os.makedirs(out_root, exist_ok=True)
        for subset in subsets:
            if video_ids:
                vids = list(video_ids[subset])
            elif jpeg_root is not None:
                vids = sorted(os.listdir(os.path.join(jpeg_root, subset)))
            else:
                raise ValueError("need video_ids or jpeg_root to enumerate videos")
            index = {}
            meta = None
            offset = 0
            with open(os.path.join(out_root, subset + ".y.bin"), "wb") as yb, open(
                os.path.join(out_root, subset + ".uv.bin"), "wb"
            ) as uvb:
                for vid in vids:
                    n = src.num_frames(subset, vid)
                    frames = src.read_frames(subset, vid, np.arange(1, n + 1))
                    h, w = frames.shape[1], frames.shape[2]
                    if h % 2:
                        frames = np.concatenate([frames, frames[:, -1:]], axis=1)
                    if w % 2:
                        frames = np.concatenate([frames, frames[:, :, -1:]], axis=2)
                    if meta is None:
                        meta = {"h": h, "w": w,
                                "hp": frames.shape[1], "wp": frames.shape[2]}
                    elif (h, w) != (meta["h"], meta["w"]):
                        raise ValueError(
                            f"mixed frame dims in {subset}: {(h, w)} vs "
                            f"{(meta['h'], meta['w'])}"
                        )
                    y, uv = rgb_to_yuv420_host(frames)
                    yb.write(y.tobytes())
                    uvb.write(uv.tobytes())
                    index[vid] = {"offset": offset, "n": n}
                    offset += n
            with open(os.path.join(out_root, subset + ".json"), "w") as f:
                json.dump({"_meta": meta or {}, "videos": index}, f)


class SyntheticFrameStore(FrameStore):
    """Deterministic fake frames: every video exists with ``n`` frames."""

    def __init__(self, num_frames: int = 64, h: int = FRAME_H, w: int = FRAME_W):
        self.n = num_frames
        self.h, self.w = h, w

    def has_video(self, subset, video_id):
        return True

    def num_frames(self, subset, video_id):
        return self.n

    def read_frames(self, subset, video_id, indices):
        import zlib

        idx = np.asarray(indices).reshape(-1).astype(np.int64)
        # crc32, not builtin hash(): stable across processes/PYTHONHASHSEED,
        # so cached synthetic features reproduce in any interpreter.
        seed = (zlib.crc32(video_id.encode()) & 0xFFFF) ^ (
            zlib.crc32(subset.encode()) & 0xFF
        )
        base = ((idx[:, None, None, None] * 37 + seed) % 251).astype(np.uint8)
        grad = (
            np.arange(self.w, dtype=np.uint8)[None, None, :, None]
            + np.arange(self.h, dtype=np.uint8)[None, :, None, None]
        )
        return (base + grad + np.arange(FRAME_C, dtype=np.uint8)).astype(np.uint8)


# --------------------------------------------------------------------------
# Class-structured synthetic world ("synthetic_class" store)
#
# SyntheticFrameStore above keys pixels on video identity only — good for
# exercising pipelines, useless for *learning* (no class signal). The
# learnable world gives every class a distinct procedural texture loop and
# every video a private spatio-temporal warp of it, so the full reference
# recipe (triplet CE training → retrieval eval) can be driven to measurable
# convergence without ActivityNet on disk. All content derives from the
# video id alone; `vqwild_tpu.datagen.synthworld` emits DB JSONs whose
# annotations agree with the same deterministic functions.
#
# Video-id grammar (shared with datagen/synthworld.py):
#   sc{cls:03d}_{i:05d}   trimmed class video: whole tape shows class `cls`
#   sn_{i:05d}            distractor/noise video: video-private texture only
#   sg{ncls:03d}_{i:05d}  untrimmed gallery video: class segments from
#                         synth_schedule() against a noise background
# --------------------------------------------------------------------------


def _crc(s: str) -> int:
    import zlib

    return zlib.crc32(s.encode())


def synth_video_frames(video_id: str) -> int:
    """Deterministic frame count (fps=3): 48-119 trimmed, 135-404 gallery."""
    h = _crc(video_id)
    if video_id.startswith("sg"):
        return 135 + h % 270
    return 48 + h % 72


def synth_schedule(video_id: str, n_classes: int):
    """Deterministic activity segments of a gallery video.

    Returns [(start_frame, end_frame, class_idx)] — 0-based, end exclusive,
    each ≥15 frames (5 s at fps 3), separated by background gaps. datagen
    emits exactly these as the video's annotation list, so the frames a
    store renders and the labels an evaluator scores always agree.
    """
    n = synth_video_frames(video_id)
    rng = np.random.default_rng(_crc(video_id))
    segs = []
    f = int(rng.integers(0, 20))
    while f < n - 18:
        length = int(rng.integers(18, 75))
        end = min(f + length, n)
        if end - f >= 15:
            segs.append((f, end, int(rng.integers(0, n_classes))))
        f = end + int(rng.integers(6, 30))
    return segs


class ClassSyntheticFrameStore(FrameStore):
    """Learnable deterministic frames: class texture loops + video warps.

    Rendering model (all int16 until the final uint8 clip):
      frame = 128 + class_loop[(t0 + t·step) % L] rolled by (y0,x0)+t·(dy,dx)
                  + video_noise rolled by t·(3,5)
    The class loop is a band-limited sinusoid mixture (distinct frequencies
    per class — textures a conv net separates well); the video warp (phase
    offset t0/tstep, texture drift dy/dx, brightness, private noise field)
    individualizes videos within a class while preserving class appearance.
    The noise field is per-video but its drift velocity is a shared
    constant (3,5) — the field itself already decorrelates videos. Loops and noise
    fields are cached per store instance, so steady-state reads are
    gather+add+clip (memcpy speed), not sin() evaluations.
    """

    LOOP = 16  # temporal loop length of the class texture

    def __init__(self, h: int = FRAME_H, w: int = FRAME_W,
                 semantics: dict | None = None):
        self.h, self.w = h, w
        self.semantics = semantics
        if semantics is not None:
            self.LOOP = int(semantics.get("loop", self.LOOP))
        self._loops: Dict[int, np.ndarray] = {}
        self._noise: Dict[str, tuple] = {}

    # -- deterministic ingredients ------------------------------------
    def _semantic_loop(self, cls: int) -> np.ndarray:
        """Texture linear in the class latent over the shared atom bank
        (datagen/synthworld.py:build_semantics — the coupled world where
        word-embedding geometry equals visual-generative geometry)."""
        sem = self.semantics
        s = np.asarray(sem["latents"][cls], np.float32)
        amp = float(sem["texture_amp"])
        yy = np.arange(self.h, dtype=np.float32)[None, :, None, None]
        xx = np.arange(self.w, dtype=np.float32)[None, None, :, None]
        tt = np.arange(self.LOOP, dtype=np.float32)[:, None, None, None]
        acc = np.zeros((self.LOOP, self.h, self.w, FRAME_C), np.float32)
        for j, atom in enumerate(sem["atoms"]):
            phase = np.asarray(atom["phase"], np.float32)
            acc += (amp * s[j]) * np.sin(
                2 * np.pi
                * (atom["fy"] * yy + atom["fx"] * xx
                   + atom["vel"] * tt / self.LOOP)
                + phase[None, None, None, :]
            )
        return np.clip(acc, -127, 127).astype(np.int16)

    def _class_loop(self, cls: int) -> np.ndarray:
        loop = self._loops.get(cls)
        if loop is None:
            if self.semantics is not None:
                loop = self._semantic_loop(cls)
                self._loops[cls] = loop
                return loop
            rng = np.random.default_rng(1_000_003 + cls)
            yy = np.arange(self.h, dtype=np.float32)[None, :, None, None]
            xx = np.arange(self.w, dtype=np.float32)[None, None, :, None]
            tt = np.arange(self.LOOP, dtype=np.float32)[:, None, None, None]
            acc = np.zeros((self.LOOP, self.h, self.w, FRAME_C), np.float32)
            for _ in range(4):
                fy, fx = rng.uniform(0.02, 0.30, size=2)
                amp = rng.uniform(18.0, 40.0)
                vel = rng.integers(1, self.LOOP)  # cycles per loop
                phase = rng.uniform(0, 2 * np.pi, size=FRAME_C).astype(np.float32)
                acc += amp * np.sin(
                    2 * np.pi * (fy * yy + fx * xx + vel * tt / self.LOOP)
                    + phase[None, None, None, :]
                )
            loop = np.clip(acc, -127, 127).astype(np.int16)
            self._loops[cls] = loop
        return loop

    def _video_warp(self, video_id: str):
        cached = self._noise.get(video_id)
        if cached is None:
            rng = np.random.default_rng(_crc(video_id) ^ 0x5EED)
            noise = rng.integers(
                -14, 15, size=(self.h, self.w, FRAME_C), dtype=np.int16
            )
            params = dict(
                t0=int(rng.integers(0, self.LOOP)),
                tstep=int(rng.integers(1, 4)),
                dy=int(rng.integers(0, 7)),
                dx=int(rng.integers(0, 7)),
                y0=int(rng.integers(0, self.h)),
                x0=int(rng.integers(0, self.w)),
                bright=int(rng.integers(-10, 11)),
            )
            cached = (noise, params)
            if len(self._noise) > 512:  # bound the per-video cache
                self._noise.clear()
            self._noise[video_id] = cached
        return cached

    def _frame_class(self, video_id: str, t0_based: np.ndarray) -> np.ndarray:
        """Per-frame class index; -1 = background/noise content."""
        if video_id.startswith("sc"):
            cls = int(video_id[2:5])
            return np.full(t0_based.shape, cls, np.int64)
        if video_id.startswith("sg"):
            ncls = int(video_id[2:5])
            out = np.full(t0_based.shape, -1, np.int64)
            for f0, f1, cls in synth_schedule(video_id, ncls):
                out[(t0_based >= f0) & (t0_based < f1)] = cls
            return out
        return np.full(t0_based.shape, -1, np.int64)

    # -- FrameStore interface -----------------------------------------
    def has_video(self, subset, video_id):
        return True

    def num_frames(self, subset, video_id):
        return synth_video_frames(video_id)

    def read_frames(self, subset, video_id, indices):
        idx = np.asarray(indices).reshape(-1).astype(np.int64) - 1  # 1-based in
        noise, p = self._video_warp(video_id)
        classes = self._frame_class(video_id, idx)
        out = np.empty((idx.size, self.h, self.w, FRAME_C), np.int16)
        # np.roll is slice copies — ~7x faster than fancy-index gathers here
        for k, (t, cls) in enumerate(zip(idx, classes)):
            t = int(t)
            out[k] = np.roll(noise, (-3 * t, -5 * t), axis=(0, 1))
            if cls >= 0:
                tex = self._class_loop(int(cls))[
                    (p["t0"] + p["tstep"] * t) % self.LOOP
                ]
                out[k] += np.roll(
                    tex,
                    (-(p["y0"] + p["dy"] * t), -(p["x0"] + p["dx"] * t)),
                    axis=(0, 1),
                )
        return np.clip(out + 128 + p["bright"], 0, 255).astype(np.uint8)


def load_synth_semantics(frames_dir: str) -> Optional[dict]:
    """Find synth_semantics.json beside the frames dir (or its parent, the
    data root — the CLI defaults frames_dir to a subdir of data_root)."""
    for d in (frames_dir, os.path.dirname(frames_dir)):
        if not d:
            continue
        path = os.path.join(d, "synth_semantics.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
    return None


def make_frame_store(kind: str, frames_dir: str) -> FrameStore:
    if kind == "jpeg":
        return JpegDirFrameStore(frames_dir)
    if kind == "packed":
        return PackedFrameStore(frames_dir)
    if kind == "packed_yuv":
        return PackedYUV420FrameStore(frames_dir)
    if kind == "synthetic":
        return SyntheticFrameStore()
    if kind == "synthetic_class":
        return ClassSyntheticFrameStore(
            semantics=load_synth_semantics(frames_dir)
        )
    raise ValueError(f"unknown frame store kind: {kind!r}")
