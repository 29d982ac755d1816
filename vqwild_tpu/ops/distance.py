"""Exact pairwise L2 scoring — the FAISS IndexFlatL2 replacement.

The reference ranks every query against the full gallery with FAISS exact L2
(dataloader_baseline.py:872-881 etc.), scoring candidates as −(squared L2
distance). On TPU the same computation is a single MXU matmul per tile:

    ‖q − g‖² = ‖q‖² + ‖g‖² − 2·q·gᵀ

Queries are processed in chunks against the (optionally mesh-sharded) gallery;
under pjit the gallery shards across devices and XLA inserts the all-gather/
concat of per-shard scores over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_l2(q, g, precision=jax.lax.Precision.HIGHEST):
    """[Q,D]×[G,D] → squared L2 distances [Q,G] (clamped ≥ 0).

    HIGHEST precision keeps fp32 matmul accuracy on TPU (the MXU would
    otherwise downcast operands to bf16, visibly perturbing rank order).
    """
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    g2 = jnp.sum(g * g, axis=-1)[None, :]
    cross = jax.lax.dot_general(
        q, g, (((1,), (1,)), ((), ())), precision=precision
    )
    return jnp.maximum(q2 + g2 - 2.0 * cross, 0.0)


# jitted wrapper for dispatch: without it the mesh/CPU path runs the
# expansion op-by-op per chunk (eager dispatch overhead per [Q,G] tile)
_pairwise_sq_l2_jit = jax.jit(pairwise_sq_l2, static_argnames=("precision",))


def _is_cross_device_sharded(x) -> bool:
    s = getattr(x, "sharding", None)
    try:
        return s is not None and len(s.device_set) > 1 and not s.is_fully_replicated
    except AttributeError:
        return False


def _use_pallas(*arrays) -> bool:
    # GSPMD cannot partition the pallas_call: a row-sharded gallery would be
    # all-gathered per device, defeating the sharding — use the XLA expansion
    # (which partitions cleanly) whenever an operand is cross-device sharded
    return jax.default_backend() == "tpu" and not any(
        _is_cross_device_sharded(a) for a in arrays
    )


def score_matrix(q, g):
    """Retrieval scores = −‖q−g‖² (higher is better), matching the reference's
    ``score = −D`` with FAISS squared distances (dataloader_baseline.py:1599-1604).

    On TPU the fused Pallas kernel computes the distance tile-by-tile on the
    MXU (ops/pallas_kernels.py); elsewhere the XLA expansion is used.
    """
    if _use_pallas(q, g):
        from vqwild_tpu.ops.pallas_kernels import pairwise_sq_l2_pallas

        return -pairwise_sq_l2_pallas(q, g)
    return -_pairwise_sq_l2_jit(q, g)
