"""Device mesh + sharding helpers.

The reference's only live parallelism is single-process DataParallel over CUDA
GPUs (model_utils.py:24-149, §2.6 of SURVEY). The TPU-native replacement is a
jax.sharding.Mesh: batches shard over the ``data`` axis, parameters and
training-step state replicate, and XLA inserts the gradient psums and the
gallery all-gathers over ICI. A second ``model`` axis is reserved for
tensor-sharding the classifier/memory heads at larger scales.

Everything here is also exercised on CPU via
``--xla_force_host_platform_device_count`` meshes (tests/conftest.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, ...] = (),
    axes: Tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """shape () → all available devices on one data axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = (len(devices),)
    assert len(shape) == len(axes)
    dev_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for batch arrays."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scan_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for scan-stacked batches [K, B, ...]: the scan axis is
    replicated, the batch axis shards (train/loop.py scan_steps path)."""
    return NamedSharding(mesh, P(None, axis))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad (by edge-repeat) so arr.shape[axis] % multiple == 0; returns
    (padded, original_length). XLA needs equal shards per device."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_idx = np.concatenate([np.arange(n), np.full(rem, n - 1)])
    return np.take(arr, pad_idx, axis=axis), n


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """device_put each array with leading-dim sharding over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return tuple(jax.device_put(a, sharding) for a in arrays)
