"""Device-side fused clip preprocessing.

The reference decodes JPEG, converts to float, normalizes, and crops per frame
on the CPU inside DataLoader workers (utils_dataset.py:104-124,
video_transforms.py) — its throughput bottleneck. Here raw uint8 frames are
shipped to the device and crop + flip + ToTensor/ImageNet-normalize run fused
on-TPU: one gather plus a cheap VPU elementwise chain, overlapping the trunk's
MXU work. uint8 host→device transfer is also 4× smaller than fp32.

`preprocess_clips` is the public entry used by the loaders and extractors.
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


def preprocess_host(frames: np.ndarray, offsets, flips, size: int) -> np.ndarray:
    """Numpy mirror for tests/parity."""
    from vqwild_tpu.data import transforms

    out = []
    for clip, (top, left), flip in zip(frames, offsets, flips):
        p = transforms.CropParams(top=int(top), left=int(left), size=size, flip=bool(flip))
        out.append(transforms.normalize_imagenet(transforms.apply_crop(clip, p)))
    return np.stack(out, axis=0)
