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


def make_frame_store(kind: str, frames_dir: str) -> FrameStore:
    if kind == "jpeg":
        return JpegDirFrameStore(frames_dir)
    if kind == "packed":
        return PackedFrameStore(frames_dir)
    if kind == "packed_yuv":
        return PackedYUV420FrameStore(frames_dir)
    if kind == "synthetic":
        return SyntheticFrameStore()
    raise ValueError(f"unknown frame store kind: {kind!r}")
