"""Pallas TPU kernels for the retrieval hot path.

``pairwise_sq_l2_pallas`` fuses the exact-L2 distance expansion
(‖q‖² + ‖g‖² − 2·q·gᵀ) into one kernel: the cross term runs on the MXU per
(TQ × TG) tile while both norm reductions are computed in-register on the
VPU — no separate norm passes or intermediate HBM traffic. This is the
FAISS-replacement primitive behind every evaluator (ops/distance.py).

Tiles are 128-aligned (MXU native); ragged Q/G are zero-padded by the wrapper
and cropped after. On non-TPU backends the kernel runs in interpreter mode
for tests; production dispatch falls back to the XLA expansion (which fuses
well too — the kernel exists to pin layout + tiling and as the base for a
future fused distance+top-k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128
TILE_G = 128


def _sq_l2_kernel(q_ref, g_ref, out_ref):
    q = q_ref[:].astype(jnp.float32)  # [TQ, D]
    g = g_ref[:].astype(jnp.float32)  # [TG, D]
    # HIGHEST keeps full fp32 matmul accuracy (6-pass MXU); the default would
    # multiply in bf16 and visibly perturb rank order near ties
    cross = jax.lax.dot_general(
        q,
        g,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TQ, TG] on the MXU
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [TQ, 1]
    g2 = jnp.sum(g * g, axis=1, keepdims=True).T  # [1, TG]
    out_ref[:] = jnp.maximum(q2 + g2 - 2.0 * cross, 0.0)


def _pad_rows(x, multiple):
    rem = (-x.shape[0]) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, rem), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_sq_l2_pallas(q, g, interpret: bool = False):
    """[Q,D]×[G,D] → squared L2 [Q,G], fused Pallas kernel."""
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    nq, ng = q.shape[0], g.shape[0]
    qp = _pad_rows(q, TILE_Q)
    gp = _pad_rows(g, TILE_G)
    d = qp.shape[1]
    grid = (qp.shape[0] // TILE_Q, gp.shape[0] // TILE_G)
    out = pl.pallas_call(
        _sq_l2_kernel,
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], gp.shape[0]), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_G, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_Q, TILE_G), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp.shape[0] * gp.shape[0] * d,
            bytes_accessed=(qp.size + gp.size + qp.shape[0] * gp.shape[0]) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, gp)
    return out[:nq, :ng]
