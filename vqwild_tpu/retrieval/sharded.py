"""Mesh-sharded gallery scoring.

The gallery feature matrix shards row-wise over the mesh's ``data`` axis
(queries replicate); the per-chunk ``[Q, G]`` score matmul then runs one
gallery shard per device and XLA concatenates shard scores over ICI — the
multi-chip form of the FAISS replacement (SURVEY §2.6/§7). Gallery rows are
edge-padded to the shard multiple; padded columns are masked as ``ignore`` so
metrics are bit-identical to the single-device path (tested on the 8-device
CPU mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqwild_tpu.ops.distance import score_matrix
from vqwild_tpu.parallel.mesh import pad_to_multiple


class GalleryScorer:
    """Holds the (optionally sharded) gallery on device; scores query chunks."""

    def __init__(self, gallery_feats: np.ndarray, mesh: Optional[Mesh] = None,
                 axis="data"):
        """``axis``: mesh axis name, or a tuple of names to shard the gallery
        rows over several axes jointly — e.g. ``("data", "model")`` reuses
        the 2-axis training mesh for eval with every device holding a row
        shard, instead of rebuilding a 1-axis mesh between phases."""
        self.n = gallery_feats.shape[0]
        self.mesh = mesh
        if mesh is not None:
            axes = (axis,) if isinstance(axis, str) else tuple(axis)
            n_shards = 1
            for a in axes:
                n_shards *= mesh.shape[a]
            padded, _ = pad_to_multiple(np.asarray(gallery_feats), n_shards)
            self.n_padded = padded.shape[0]
            spec = P(axes[0] if len(axes) == 1 else axes)
            self.g_dev = jax.device_put(padded, NamedSharding(mesh, spec))
            self._q_sharding = NamedSharding(mesh, P())  # queries replicate
        else:
            self.n_padded = self.n
            self.g_dev = jnp.asarray(gallery_feats)
            self._q_sharding = None

    def pad_columns(self, tp: np.ndarray, ignore: np.ndarray):
        """Extend per-query tp/ignore to padded gallery width (pads ignored)."""
        extra = self.n_padded - self.n
        if extra == 0:
            return tp, ignore
        tp = np.concatenate([tp, np.zeros((tp.shape[0], extra), bool)], axis=1)
        ignore = np.concatenate(
            [ignore, np.ones((ignore.shape[0], extra), bool)], axis=1
        )
        return tp, ignore

    def scores(self, qfeats: np.ndarray, out_dtype=None):
        """[B, D] queries → [B, n_padded] scores (device array).

        ``out_dtype`` casts on device before any host readback — shipping
        bf16 halves the device→host score bytes, which dominates moment
        eval behind a slow link (measured 226 s of a 334 s run for
        128×1.64M fp32 scores through the dev relay;
        benchmarks/EVAL_SCALE_r03_tpu_moment.json)."""
        q = jnp.asarray(qfeats)
        if self._q_sharding is not None:
            q = jax.device_put(q, self._q_sharding)
        s = score_matrix(q, self.g_dev)
        if out_dtype is not None:
            s = s.astype(out_dtype)
        return s
