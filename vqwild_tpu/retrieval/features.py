"""Feature extraction drivers for the evaluators.

Mirrors do_eval's feat_func closure (main.py:220-233): the model's eval
forward → per-frame embeddings L2-normalized over the channel dim → numpy
[B, C, T]; plus the fake-feature backend (--memory_leak_debug,
dataloader_baseline.py:721-724) that exercises the whole retrieval stack
without a model.

``FeatureExtractor`` handles batching, the wire format (cropped uint8 RGB or
4:2:0 planes — ops/preprocess.py), long-video chunk tapes, and the on-disk
feature cache (the reference's feat_cache.pkl, :1450-1456 — ours is a
directory of memmap-able .npy files).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.core.logging import get_logger
from vqwild_tpu.data.clips import batch_cropped_clips, read_clip_raw
from vqwild_tpu.data.frames import FrameStore
from vqwild_tpu.data.longvideo import enumerate_chunks, read_chunk_batch
from vqwild_tpu.data.schema import VideoRecord
from vqwild_tpu.ops.hostmem import alloc_array
from vqwild_tpu.ops.preprocess import normalize_clips

log = get_logger("retrieval.features")


def make_feat_fn(
    model, variables, mesh=None, wire: str = "rgb", folded: bool = True,
    quant: Optional[str] = None, calib_path: Optional[str] = None,
    stem_impl: str = "xla",
) -> Callable:
    """Returns f(clips [B,T,s,s,C] uint8-cropped or float) → np [B, C, T],
    frame embeddings L2-normalized across channels (main.py:232). uint8 input
    gets ImageNet-normalized on device inside the jit.

    ``wire="yuv420"`` returns f(y [B,T,s,s] u8, uv [B,T,s/2,s/2,2] u8)
    instead — the 1.5-byte/pixel wire format (ops/preprocess.py): chroma
    upsample + BT.601 + normalize fuse into the same jit, halving the
    host→device transfer on bandwidth-bound links.

    ``folded=True`` (production default) runs the BN-constant-folded eval
    trunk (models/fold.py); on the yuv420 wire the entire preprocess
    additionally folds into a space-to-depth stem conv (+15% device
    throughput, exact modulo the out-of-gamut clip — see
    fold.stem_to_yuv_s2d). ``folded=False`` keeps the trained module's graph.

    ``quant="int8"`` (yuv420 wire only) serves the post-training-quantized
    trunk (models/quant.py, ~1.33x device throughput on v5e): calibration
    runs a float shadow on the FIRST batch this fn sees, then every batch —
    including that one — is embedded through the int8 graph, so features are
    uniform and deterministic given the batch stream. ``calib_path`` pins
    the numerics across processes: an existing file is loaded instead of
    calibrating (no batch-order dependence at all); otherwise the
    first-batch calibration is saved there for the next process.

    With a mesh, extraction batches shard over the ``data`` axis (rows are
    edge-padded to the shard multiple and cropped after) — the multi-chip
    feature-extraction path."""

    if stem_impl not in ("xla", "pallas"):
        raise ValueError(f"unknown stem_impl {stem_impl!r}")
    if stem_impl == "pallas" and (quant is not None or not folded):
        raise ValueError("stem_impl='pallas' requires folded=True, quant=None")

    if quant is not None:
        if quant not in ("int8", "int8_const"):
            raise ValueError(f"unknown quant mode {quant!r}")
        if wire != "yuv420":
            raise ValueError(f"quant={quant!r} requires wire='yuv420'")
        # int8_const bakes the quantized params in as jit constants
        # (~1.13x serving dispatch, recompile per calibration; quant.py)
        const_params = quant == "int8_const"
        if const_params and mesh is not None:
            raise ValueError("quant='int8_const' is single-device only")
        import threading

        from vqwild_tpu.models import quant as quant_mod

        cell: dict = {}
        cell_lock = threading.Lock()  # concurrent first calls (e.g. HTTP
        # handler threads) must not each calibrate on their own batch —
        # scales would become nondeterministic and the float shadow would
        # run twice

        def _mesh_device():
            if mesh is None:
                return None
            # params replicate over the mesh (they are jit args; their
            # sharding must compose with the sharded batch)
            from jax.sharding import NamedSharding, PartitionSpec

            return NamedSharding(mesh, PartitionSpec())

        if calib_path is not None and os.path.exists(calib_path):
            cell["fn"] = quant_mod.make_int8_embed_fn(
                variables,
                None,
                calib=quant_mod.load_calibration(calib_path),
                device=_mesh_device(),
                bn_eps=model.bn_eps,
                const_params=const_params,
            )

        def _fwd(*planes):
            if "fn" not in cell:
                with cell_lock:
                    if "fn" not in cell:
                        calib_planes = tuple(np.asarray(p) for p in planes)
                        calib = quant_mod.calibrate_trunk(
                            variables, *calib_planes, bn_eps=model.bn_eps
                        )
                        if calib_path is not None:
                            quant_mod.save_calibration(calib_path, calib)
                        cell["fn"] = quant_mod.make_int8_embed_fn(
                            variables,
                            None,
                            calib=calib,
                            device=_mesh_device(),
                            bn_eps=model.bn_eps,
                            const_params=const_params,
                        )
            return cell["fn"](*planes)

    elif folded:
        from vqwild_tpu.models.fold import make_embed_fn

        if stem_impl == "pallas" and wire != "yuv420":
            raise ValueError("stem_impl='pallas' requires wire='yuv420'")
        _fwd = jax.jit(
            make_embed_fn(
                variables,
                dtype=model.dtype,
                stem_mode="yuv_s2d" if wire == "yuv420" else "conv7",
                bn_eps=model.bn_eps,
                stem_impl=stem_impl,
            )
        )
        if wire not in ("rgb", "yuv420"):
            raise ValueError(f"unknown wire format {wire!r}")
    else:

        def _head(x):
            out = model.apply(variables, x, train=False)
            fe = out.frame_embed  # [B, T, C]
            fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-12)
            return jnp.transpose(fe, (0, 2, 1))  # [B, C, T]

        if wire == "yuv420":
            from vqwild_tpu.ops.preprocess import normalize_clips_yuv420

            @jax.jit
            def _fwd(*planes):
                return _head(normalize_clips_yuv420(*planes, out_dtype=model.dtype))

        elif wire == "rgb":

            @jax.jit
            def _fwd(x):
                if x.dtype == jnp.uint8:
                    x = normalize_clips(x, out_dtype=model.dtype)
                return _head(x)

        else:
            raise ValueError(f"unknown wire format {wire!r}")

    if mesh is None:
        def feat_fn(*arrays):
            return np.asarray(_fwd(*(jnp.asarray(a) for a in arrays)))

        return feat_fn

    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqwild_tpu.parallel.mesh import pad_to_multiple

    n_shards = mesh.shape["data"]
    sharding = NamedSharding(mesh, P("data"))

    def feat_fn_sharded(*arrays):
        padded = []
        n = None
        for a in arrays:
            p, n = pad_to_multiple(np.asarray(a), n_shards)
            padded.append(jax.device_put(p, sharding))
        out = _fwd(*padded)
        return np.asarray(out)[:n]

    return feat_fn_sharded


def make_fake_feat_fn(feat_dim: int = 512, seed: Optional[int] = None) -> Callable:
    """Random features in [0,1) like np.random.rand — the memory_leak_debug
    backend. A seed makes runs reproducible (upstream uses the global RNG)."""
    rng = np.random.default_rng(seed)

    def feat_fn(clips):
        b, t = clips.shape[0], clips.shape[1]
        return rng.random((b, feat_dim, t), dtype=np.float32)

    return feat_fn


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


class FeatureExtractor:
    def __init__(
        self,
        feat_fn: Callable,
        store: FrameStore,
        test_frames: int = 32,
        test_batch_size: int = 30,
        input_size: int = 112,
        fps: int = 3,
        fake: bool = False,
        cache_dir: Optional[str] = None,
        max_batches: Optional[int] = None,
        wire: str = "rgb",
    ):
        self.feat_fn = feat_fn
        self.store = store
        self.test_frames = test_frames
        self.test_batch_size = test_batch_size
        self.input_size = input_size
        self.fps = fps
        self.fake = fake
        self.cache_dir = cache_dir
        # debug cap on eval feature batches (reference debug_iter,
        # dataloader_baseline.py:17, :718-719, :1459)
        self.max_batches = max_batches
        # wire="yuv420": ship 4:2:0 planes instead of RGB (half the
        # host→device bytes; see ops/preprocess.py). feat_fn must be built
        # with the matching make_feat_fn(wire=...). Stores that hold YUV
        # natively (PackedYUV420FrameStore) skip the host pack entirely.
        if wire not in ("rgb", "yuv420"):
            raise ValueError(f"unknown wire format {wire!r}")
        self.wire = wire
        self.yuv_native = (
            wire == "yuv420" and not fake and getattr(store, "supports_yuv", False)
        )

    def _pad_rows(self, *arrays):
        """Edge-pad row counts to test_batch_size so the trunk compiles for
        exactly one batch shape; returns (padded arrays, real n)."""
        n = arrays[0].shape[0]
        if not 0 < n < self.test_batch_size:
            return arrays, n
        k = self.test_batch_size - n
        return tuple(
            np.concatenate([a, np.repeat(a[-1:], k, axis=0)], axis=0)
            for a in arrays
        ), n

    def _embed_cropped(self, clips_u8) -> np.ndarray:
        """cropped uint8 clips → [B, C, T] features; normalization happens on
        device inside feat_fn's jit (feat_fn accepts uint8)."""
        (clips_u8,), n = self._pad_rows(clips_u8)
        if self.wire == "yuv420":
            from vqwild_tpu.ops.preprocess import rgb_to_yuv420_host

            y, uv = rgb_to_yuv420_host(clips_u8)
            return self.feat_fn(y, uv)[:n]
        return self.feat_fn(clips_u8)[:n]

    def _embed_planes(self, y_u8, uv_u8) -> np.ndarray:
        """cropped 4:2:0 planes → [B, C, T] features (yuv-native stores)."""
        (y_u8, uv_u8), n = self._pad_rows(y_u8, uv_u8)
        return self.feat_fn(y_u8, uv_u8)[:n]

    def extract_trimmed(self, records: Sequence[VideoRecord]) -> np.ndarray:
        """[N', C] clip features (N' < N under a debug cap): per-frame
        embeddings mean-pooled over T (dataloader_baseline.py:1481-1483).
        CenterCrop at eval."""
        if self.max_batches is not None:
            records = list(records)[: self.max_batches * self.test_batch_size]
        feats: List[np.ndarray] = []
        for batch in _chunks(list(records), self.test_batch_size):
            if self.fake:
                f = self.feat_fn(
                    np.zeros((len(batch), self.test_frames, 1, 1, 3), np.float32)
                )
            elif self.yuv_native:
                from vqwild_tpu.data.clips import (
                    batch_cropped_clips_yuv,
                    read_clip_yuv,
                )

                clips = [
                    read_clip_yuv(
                        self.store,
                        rec,
                        self.test_frames,
                        fps=self.fps,
                        rng=None,
                        crop_size=self.input_size,
                    )
                    for rec in batch
                ]
                f = self._embed_planes(
                    *batch_cropped_clips_yuv(clips, self.input_size)
                )
            else:
                clips = [
                    read_clip_raw(
                        self.store,
                        rec,
                        self.test_frames,
                        fps=self.fps,
                        rng=None,
                        crop_size=self.input_size,
                    )
                    for rec in batch
                ]
                f = self._embed_cropped(batch_cropped_clips(clips))
            feats.append(np.mean(f, axis=-1))  # [B, C]
        return np.concatenate(feats, axis=0)

    def extract_video_tapes(self, gallery: Sequence[VideoRecord]) -> List[np.ndarray]:
        """Per-video feature tapes [C, T_total] from contiguous chunks
        (dataloader_baseline.py:742-784). Videos left without chunks under a
        debug cap get empty tapes (callers skip zero-length tapes).

        Tapes are preallocated and chunk features written in place — at
        production scale (~60k chunks → several GB of tape) a gather-then-
        regroup materializes the whole feature block twice and dominates the
        gallery build."""
        refs = enumerate_chunks(gallery, self.store, self.test_frames)
        if self.max_batches is not None:
            refs = refs[: self.max_batches * self.test_batch_size]
        n_chunks = np.zeros(len(gallery), np.int64)
        for r in refs:
            n_chunks[r.video_idx] += 1
        t = self.test_frames
        offsets = np.concatenate([[0], np.cumsum(n_chunks)]) * t
        arena: Optional[np.ndarray] = None  # one [C, ΣT] block, pre-touched
        tapes: List[np.ndarray] = []
        for ref_batch in _chunks(refs, self.test_batch_size):
            if self.fake:
                f = self.feat_fn(
                    np.zeros((len(ref_batch), self.test_frames, 1, 1, 3), np.float32)
                )
            elif self.yuv_native:
                from vqwild_tpu.data.longvideo import read_chunk_batch_yuv

                f = self._embed_planes(
                    *read_chunk_batch_yuv(
                        ref_batch,
                        gallery,
                        self.store,
                        self.test_frames,
                        self.input_size,
                        self.fps,
                    )
                )
            else:
                f = self._embed_cropped(
                    read_chunk_batch(
                        ref_batch,
                        gallery,
                        self.store,
                        self.test_frames,
                        self.input_size,
                        self.fps,
                    )
                )
            if arena is None:
                feat_dim = f.shape[1]
                arena = alloc_array((feat_dim, int(offsets[-1])), np.float32)
                tapes = [
                    arena[:, offsets[vi] : offsets[vi + 1]]
                    for vi in range(len(gallery))
                ]
            for feat, ref in zip(f, ref_batch):
                base = ref.seg_id * t
                tapes[ref.video_idx][:, base : base + t] = feat
        if arena is None:  # no refs at all
            tapes = [np.empty((0, 0), np.float32) for _ in gallery]
        return tapes

    # -- cache --
    #
    # Format: a directory of plain .npy files, one per key (name "x.npz" →
    # dir "x/"). Numeric arrays are written through np.lib.format.open_memmap
    # and loaded with mmap_mode="r": no zip deflate on write, zero-copy
    # on-demand paging on read — at production scale the moment gallery is a
    # multi-GB feats block and the .npz round trip cost minutes. Legacy .npz
    # files are still readable. (Reference: feat_cache.pkl, :1450-1456.)
    def cache_path(self, name: str) -> Optional[str]:
        if not self.cache_dir:
            return None
        os.makedirs(self.cache_dir, exist_ok=True)
        return os.path.join(self.cache_dir, name)

    def load_cache(self, name: str):
        path = self.cache_path(name)
        if not path:
            return None
        base = path[:-4] if path.endswith(".npz") else path
        if os.path.isdir(base):
            log.warning("loading feature cache %s/", base)
            out = {}
            for fn in sorted(os.listdir(base)):
                if not fn.endswith(".npy"):
                    continue
                fp = os.path.join(base, fn)
                try:
                    arr = np.load(fp, mmap_mode="r")
                except ValueError:  # object/str arrays can't memmap
                    arr = np.load(fp, allow_pickle=True)
                out[fn[:-4]] = arr
            return out or None
        if os.path.exists(path):  # legacy single-file .npz
            log.warning("loading feature cache %s", path)
            with np.load(path, allow_pickle=True) as z:
                return {k: z[k] for k in z.files}
        return None

    def save_cache(self, name: str, **arrays):
        path = self.cache_path(name)
        if not path:
            return
        base = path[:-4] if path.endswith(".npz") else path
        log.warning("writing feature cache %s/", base)
        # unique tmp per writer: two processes evaluating into the same
        # run_dir must not interleave files in one staging directory. The
        # finally-rmtree bounds orphaned staging dirs from crashed writers
        # (a no-op after a successful os.replace — tmp no longer exists).
        import shutil
        import uuid

        tmp = f"{base}.{uuid.uuid4().hex}.tmp"
        os.makedirs(tmp)
        try:
            for key, arr in arrays.items():
                arr = np.asarray(arr)
                fp = os.path.join(tmp, key + ".npy")
                if arr.dtype == object or arr.dtype.kind in "US":
                    np.save(fp, arr)
                else:
                    mm = np.lib.format.open_memmap(
                        fp, mode="w+", dtype=arr.dtype, shape=arr.shape
                    )
                    mm[...] = arr
                    mm.flush()
                    del mm
            # atomic publish so a crashed writer never leaves a half cache.
            # ignore_errors: a concurrent writer may be clearing the same
            # stale dir — whoever's os.replace lands second just accepts the
            # other's (identical-by-construction) result below.
            if os.path.isdir(base):
                shutil.rmtree(base, ignore_errors=True)
            try:
                os.replace(tmp, base)
            except OSError:
                # accept a concurrent writer's published result only if it is
                # complete: a half-deleted dir (rmtree partially failed) would
                # otherwise pass a bare isdir check and poison later forced
                # reads. listdir failing here (base missing/unreadable) also
                # raises, surfacing the replace failure with context.
                have = set(os.listdir(base))
                want = {key + ".npy" for key in arrays}
                if not want <= have:
                    raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
