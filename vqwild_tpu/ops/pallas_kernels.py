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


# ---------------------------------------------------------------------------
# Fused stem conv + ReLU + 3x3/2 maxpool (the folded yuv-s2d serving stem)
# ---------------------------------------------------------------------------
#
# The folded eval trunk's stem (models/fold.py stem_mode="yuv_s2d") is a 4x4
# stride-1 conv on the [H,W,6] centered-YUV s2d feed (56x56 in production),
# ReLU, then a 3x3/2 maxpool. As separate XLA ops the [56,56,64] pre-pool
# activation round-trips HBM (~0.8 MB/frame write+read — the stem is
# bandwidth-bound, see docs/TRUNK_PROFILE.md). This kernel keeps it in VMEM:
# im2col + one MXU matmul + in-register pooling, writing only the pooled
# [28,28,64].
#
# MEASURED RESULT (v5e, 2026-08-17): SLOWER than the XLA stem — 6.70 vs
# 4.44 ms whole-trunk at the production batch (2,389 vs 3,604 clips/s).
# The stem's shapes are hostile to Mosaic's (sublane, lane) tiling — 24/96
# lanes and 56/59 sublanes all pad or relayout, and the workarounds below
# (offset-normalized concat, fp32-only rotates) cost more VPU time than the
# saved HBM traffic (≤0.3 ms bound, docs/TRUNK_PROFILE.md). Kept as an
# interpret-verified reference for a future Mosaic that lowers these shapes
# natively; production keeps stem_impl="xla". See TRUNK_PROFILE.md
# "Fused-stem Pallas attempt".
#
# Mosaic shapes the decomposition: concatenating slices whose *sublane*
# (second-minor) offsets differ is unsupported ("offset mismatch on
# non-concat dimension"), and strided slices on vector values lower to an
# unsupported >2D gather. So: the 4 column taps are pre-expanded by XLA into
# the channel dim OUTSIDE the kernel (input grows 4x but is tiny next to the
# pre-pool activation); the 4 row taps are slices along the untiled H axis,
# which never perturb tiled offsets; even-ROW selection is an untiled-axis
# reshape-and-index (pure metadata); column windows come from pltpu.roll
# (which normalizes sublane offsets); and the final even-COLUMN selection is
# a stride-2 XLA slice on the kernel's full-width output.

STEM_F = 2  # frames per grid step (VMEM ~8 MB/step at 56x56)


def _stem_pool_kernel(x_ref, w_ref, b_ref, out_ref):
    x = x_ref[:]  # [F, H+3, W, 4C] (cols pre-expanded, rows pre-padded)
    f, hp, w, _ = x.shape
    h = hp - 3
    patch = jnp.concatenate([x[:, i : i + h] for i in range(4)], axis=-1)
    # [F, H, W, 16C]; channel order (i, j, c) matches kernel.reshape(16C, 64)
    # of the HWIO [4,4,C,64] stem kernel
    acc = jax.lax.dot_general(
        patch,
        w_ref[:],
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F, H, W, 64] on the MXU
    # pool in fp32 (Mosaic's rotate is 32-bit only) and downcast at the
    # write; max commutes with the monotone bf16 rounding, so this matches
    # XLA's cast-then-pool bit-for-bit
    y = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    # 3x3/2 maxpool rows (untiled H axis): window max, then even rows via
    # reshape-and-index
    p = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)), constant_values=neg)
    rm = jnp.maximum(jnp.maximum(p[:, 0:h], p[:, 1 : h + 1]), p[:, 2 : h + 2])
    re = rm.reshape(f, h // 2, 2, w, rm.shape[-1])[:, :, 0]  # [F, H/2, W, 64]
    # column window max at every x (even-x selection happens outside)
    pc = jnp.pad(re, ((0, 0), (0, 0), (1, 1), (0, 0)), constant_values=neg)
    c1 = pltpu.roll(pc, w + 1, axis=2)  # left-shift by 1 (shift must be >= 0)
    c2 = pltpu.roll(pc, w, axis=2)  # left-shift by 2
    out_ref[:] = jnp.maximum(
        jnp.maximum(pc[:, :, 0:w], c1[:, :, 0:w]), c2[:, :, 0:w]
    ).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_s2d_pool_pallas(x, kernel, bias, interpret: bool = False):
    """[N,H,W,C] s2d feed x [4,4,C,64] HWIO folded stem kernel → pooled
    [N,H/2,W/2,64] (conv pad ((2,1),(2,1)) + bias + ReLU + 3x3/2 maxpool
    pad 1, exactly ResNet18F2FInfer's stem block in one fused pass; H, W
    even)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    wm = kernel.reshape(16 * c, -1).astype(x.dtype)
    b = bias.reshape(1, -1)
    xp = jnp.pad(x, ((0, 0), (2, 1), (2, 1), (0, 0)))
    # pre-expand the 4 column taps into channels: [N, H+3, W, 4C], (j, c)
    xw = jnp.concatenate([xp[:, :, j : j + w] for j in range(4)], axis=-1)
    rem = (-n) % STEM_F
    if rem:
        xw = jnp.pad(xw, ((0, rem), (0, 0), (0, 0), (0, 0)))
    grid = (xw.shape[0] // STEM_F,)
    out = pl.pallas_call(
        _stem_pool_kernel,
        out_shape=jax.ShapeDtypeStruct((xw.shape[0], h // 2, w, 64), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (STEM_F, h + 3, w, 4 * c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((16 * c, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (STEM_F, h // 2, w, 64), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * xw.shape[0] * h * w * 16 * c * 64,
            bytes_accessed=(xw.size + wm.size + xw.shape[0] * h * (w // 2) * 32) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xw, wm, b)
    return out[:n, :, ::2]
