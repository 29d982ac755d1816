"""Clip preprocessing: host crop/flip + device-fused normalize.

The reference decodes JPEG, converts to float, normalizes, and crops per frame
on the CPU inside DataLoader workers (utils_dataset.py:104-124,
video_transforms.py) — its throughput bottleneck.

Production split (measured on TPU v5e):
* crop + flip are pure numpy slicing — memcpy-speed, done in the parallel
  loader threads (``crop_clips_host``). Shipping the cropped uint8 is also the
  smallest possible host→device transfer (112² × 1 byte).
* ToTensor + ImageNet normalize fuse into the model jit on device
  (``normalize_clips``) — one VPU elementwise chain overlapping MXU work.

``preprocess_clips`` (all-device crop via vmapped dynamic_slice) is kept for
reference/tests but is NOT the production path: XLA lowers the per-sample
dynamic crop to a gather that compiles for minutes and runs ~100× slower than
the trunk itself on TPU. A Pallas scalar-prefetch crop kernel could reclaim
this; the host split already removes the cost entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@functools.partial(jax.jit, static_argnames=("size", "out_dtype"))
def preprocess_clips(frames, offsets, flips, size: int, out_dtype=jnp.float32):
    """frames [B,T,H,W,C] uint8, offsets [B,2] (top,left) int32, flips [B] bool
    → [B,T,size,size,C] normalized.

    The whole-clip crop/flip semantics match video_transforms.py: one
    parameterization applied to all T frames of a clip.
    """
    frames = jnp.asarray(frames)
    b, t, h, w, c = frames.shape

    def one(clip, off, flip):
        crop = jax.lax.dynamic_slice(
            clip, (0, off[0], off[1], 0), (t, size, size, c)
        )
        return jnp.where(flip, crop[:, :, ::-1, :], crop)

    cropped = jax.vmap(one)(frames, offsets, flips)
    x = cropped.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN)
    inv_std = jnp.asarray(1.0 / IMAGENET_STD)
    return ((x - mean) * inv_std).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def normalize_clips(clips_u8, out_dtype=jnp.float32):
    """uint8 [..., C] (already cropped/flipped) → normalized float on device."""
    x = jnp.asarray(clips_u8).astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN)
    inv_std = jnp.asarray(1.0 / IMAGENET_STD)
    return ((x - mean) * inv_std).astype(out_dtype)


# ---- YUV 4:2:0 wire format ----
#
# The production host→device wire format: planar Y [.,H,W] + interleaved
# chroma UV [.,H/2,W/2,2], 1.5 bytes/pixel vs RGB's 3. The ARV source frames
# are JPEG (4:2:0 chroma-subsampled at encode time), so shipping 4:2:0 loses
# nothing the JPEG hadn't already dropped — while halving the host→device
# transfer AND the packed-store disk footprint. Chroma upsample (nearest) +
# BT.601 full-range conversion + ImageNet normalize all fuse into the model
# jit as one VPU elementwise chain. (JFIF/BT.601 full-range constants.)

def rgb_to_yuv420_host(rgb_u8: np.ndarray):
    """[..., H, W, 3] uint8 → (Y [..., H, W], UV [..., H/2, W/2, 2]) uint8.

    H and W must be even. Chroma is the mean of each 2x2 block (the standard
    4:2:0 downsample); since the RGB→YUV map is linear, Cb/Cr are computed
    directly from the 2x2-block-mean RGB — 4x less chroma math and no
    full-resolution chroma temporaries. Vectorized numpy, in-place
    accumulation (one float32 luma plane, one quarter-size RGB mean) — runs
    in loader threads."""
    h, w = rgb_u8.shape[-3], rgb_u8.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even dims, got {h}x{w}")
    lead = rgb_u8.shape[:-3]
    r = rgb_u8[..., 0]
    g = rgb_u8[..., 1]
    b = rgb_u8[..., 2]
    # luma: one float32 plane, accumulated in place
    yf = np.multiply(r, np.float32(0.299), dtype=np.float32)
    yf += np.multiply(g, np.float32(0.587), dtype=np.float32)
    yf += np.multiply(b, np.float32(0.114), dtype=np.float32)
    np.rint(yf, out=yf)
    y = yf.astype(np.uint8)  # 0.299+0.587+0.114 = 1 → already in [0,255]
    # chroma from block-mean RGB (uint8 2x2 sums fit uint16)
    blk = rgb_u8.reshape(lead + (h // 2, 2, w // 2, 2, 3))
    s = blk.astype(np.uint16).sum(axis=-2, dtype=np.uint16).sum(axis=-3, dtype=np.uint16)
    rm = s[..., 0].astype(np.float32)
    gm = s[..., 1]
    bm = s[..., 2]
    q = np.float32(0.25)
    cb = np.multiply(rm, np.float32(-0.168736) * q, dtype=np.float32)
    cb += np.multiply(gm, np.float32(-0.331264) * q, dtype=np.float32)
    cb += np.multiply(bm, np.float32(0.5) * q, dtype=np.float32)
    cb += np.float32(128.0)
    cr = np.multiply(rm, np.float32(0.5) * q, dtype=np.float32)
    cr += np.multiply(gm, np.float32(-0.418688) * q, dtype=np.float32)
    cr += np.multiply(bm, np.float32(-0.081312) * q, dtype=np.float32)
    cr += np.float32(128.0)
    uv = np.empty(lead + (h // 2, w // 2, 2), np.uint8)
    np.clip(np.rint(cb, out=cb), 0, 255, out=cb)
    np.clip(np.rint(cr, out=cr), 0, 255, out=cr)
    uv[..., 0] = cb
    uv[..., 1] = cr
    return y, uv


def yuv420_to_rgb_host(y_u8: np.ndarray, uv_u8: np.ndarray) -> np.ndarray:
    """Numpy mirror of the device conversion: (Y, UV) → RGB uint8.

    Nearest-neighbor chroma upsample + BT.601 full-range. Used by the packed
    YUV store's RGB-interface fallback and parity tests."""
    y = y_u8.astype(np.float32)
    uv = uv_u8.astype(np.float32) - 128.0
    uv = np.repeat(np.repeat(uv, 2, axis=-3), 2, axis=-2)
    cb, cr = uv[..., 0], uv[..., 1]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def normalize_clips_yuv420(y_u8, uv_u8, out_dtype=jnp.float32):
    """(Y [...,H,W], UV [...,H/2,W/2,2]) uint8 → [...,H,W,3] ImageNet-normalized.

    Nearest-neighbor chroma upsample + BT.601 full-range → RGB in [0,1] →
    ImageNet normalize, fused on device."""
    y = jnp.asarray(y_u8).astype(jnp.float32)
    uv = jnp.asarray(uv_u8).astype(jnp.float32) - 128.0
    uv = jnp.repeat(jnp.repeat(uv, 2, axis=-3), 2, axis=-2)  # nearest upsample
    cb, cr = uv[..., 0], uv[..., 1]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    x = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN)
    inv_std = jnp.asarray(1.0 / IMAGENET_STD)
    return ((x - mean) * inv_std).astype(out_dtype)


def crop_yuv420_host(y: np.ndarray, uv: np.ndarray, offsets, flips, size: int):
    """Whole-clip crop+flip directly in YUV420 planes.

    y [B,T,H,W], uv [B,T,H/2,W/2,2] → cropped (y, uv) at ``size``. Crop
    offsets are rounded down to even so the chroma grid stays aligned (a
    ≤1-pixel shift vs the RGB path; ``size`` must be even)."""
    if size % 2:
        raise ValueError("YUV420 crop size must be even")
    b = y.shape[0]
    oy = np.empty((b, y.shape[1], size, size), y.dtype)
    ouv = np.empty((b, uv.shape[1], size // 2, size // 2, 2), uv.dtype)
    for i in range(b):
        top = (int(offsets[i][0]) // 2) * 2
        left = (int(offsets[i][1]) // 2) * 2
        cy = y[i, :, top : top + size, left : left + size]
        cuv = uv[i, :, top // 2 : top // 2 + size // 2, left // 2 : left // 2 + size // 2, :]
        if flips[i]:
            cy = cy[:, :, ::-1]
            cuv = cuv[:, :, ::-1, :]
        oy[i] = cy
        ouv[i] = cuv
    return oy, ouv


def crop_clips_host(frames: np.ndarray, offsets, flips, size: int) -> np.ndarray:
    """Host crop+flip: [B,T,H,W,C] u8 + per-clip (top,left)/flip → [B,T,s,s,C] u8.

    Pure slicing — each clip is one contiguous-ish memcpy; runs inside loader
    threads (numpy releases the GIL)."""
    b = frames.shape[0]
    out = np.empty((b, frames.shape[1], size, size, frames.shape[4]), frames.dtype)
    for i in range(b):
        top, left = int(offsets[i][0]), int(offsets[i][1])
        clip = frames[i, :, top : top + size, left : left + size, :]
        out[i] = clip[:, :, ::-1, :] if flips[i] else clip
    return out


def preprocess_host(frames: np.ndarray, offsets, flips, size: int) -> np.ndarray:
    """Numpy mirror for tests/parity."""
    from vqwild_tpu.data import transforms

    out = []
    for clip, (top, left), flip in zip(frames, offsets, flips):
        p = transforms.CropParams(top=int(top), left=int(left), size=size, flip=bool(flip))
        out.append(transforms.normalize_imagenet(transforms.apply_crop(clip, p)))
    return np.stack(out, axis=0)
