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
