"""Retrieval-model heads: non-local batch↔memory attention, semantic adaptor,
memory-distance logits, sequential EMA memory update.

These reimplement the reference's head semantics (misc_utils/nl.py,
models/resnet18_va.py:154-202, models/resnet18_vasa.py:177-237) as fused
matmul modules — the upstream per-sample Python loops become batched pairwise
distances, and the 1x1 Conv1d stacks become Dense layers (identical math).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init():
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both kernel and bias (kaiming_uniform(a=sqrt(5)))."""

    def kernel_init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init


def torch_bias_init(fan_in: int):
    def bias_init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return bias_init


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    torch's F.batch_norm normalizes with the BIASED batch variance but
    updates the running variance with the UNBIASED one (×n/(n−1));
    flax.linen.BatchNorm uses the biased variance for both. The difference
    is ~1/n relative per update — invisible at production shapes but
    resolvable by the train-numerics differential tests at small n
    (tests/test_train_parity.py), and it is the reference's semantics
    (BatchNorm3d everywhere in models/resnet18_*.py), so we match it.

    Collections and naming mirror flax BatchNorm: params ``scale``/``bias``,
    batch_stats ``mean``/``var`` — checkpoint import/export and BN folding
    (models/fold.py) are layout-unchanged.
    """

    use_running_average: bool
    momentum: float = 0.99  # flax convention: new = m·old + (1−m)·batch
    epsilon: float = 1e-3
    scale_init: Any = nn.initializers.ones
    # fast_variance=False computes the two-pass E[(x−μ)²] instead of
    # E[x²]−E[x]²: required where per-channel spread is tiny relative to
    # the mean (the non-local W-BN, whose batch rows are near-identical
    # attention outputs — the shortcut's cancellation visibly corrupts the
    # BN-scale gradient there). The trunk keeps the one-pass form: its
    # activations are well-spread (gradients match torch at 2e-5 either
    # way, tests/test_train_parity.py) and the extra pass over every trunk
    # activation costs ~10% of the train step.
    fast_variance: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            if self.fast_variance:
                var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            else:
                var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * (
                    n / max(n - 1, 1)
                )
        # normalize in the compute dtype (flax-style): under bf16 the f32
        # path would double the VPU bytes of every BN in the train step
        dt = self.dtype
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dt)
        return (x.astype(dt) - mean.astype(dt)) * inv + bias.astype(dt)


def dense_torch(features: int, fan_in: int, name: str, dtype=jnp.float32) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_init(),
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def pairwise_l2(a, b, eps: float = 0.0):
    """Exact pairwise Euclidean distances ||a_i - b_j||_2 → [N, M].

    Computed as a difference expansion with a matmul on the cross term (MXU)
    rather than materializing [N, M, C] differences.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [N,1]
    b2 = jnp.sum(b * b, axis=-1)[None, :]  # [1,M]
    cross = a @ b.T  # [N,M]
    sq = jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)
    return jnp.sqrt(sq + eps)


def memory_distance_logits(embed, memory, temperature: float):
    """reg/word logits: −‖e − m‖₂ / τ per class (resnet18_va.py:172-184 —
    upstream loops over the batch; this is the batched equivalent)."""
    return -pairwise_l2(embed, memory) / temperature


def ema_memory_update(memory, embeds, targets, mv: float, weights=None):
    """Sequential EMA visual-memory update (resnet18_va.py:186-192).

    mem[y_i] = normalize(mv·mem[y_i] + (1−mv)·e_i), applied in batch order so
    repeated labels compound exactly as upstream. Gradients do not flow
    (upstream wraps in no_grad; callers stop_gradient the inputs).

    ``weights`` (0/1 per row) skips padded rows — used when batches are
    row-padded to a device-mesh multiple (train/step.py).
    """
    embeds = jax.lax.stop_gradient(embeds)

    def body(i, mem):
        y = targets[i]
        updated = l2_normalize(mv * mem[y] + (1.0 - mv) * embeds[i], axis=-1)
        if weights is not None:
            updated = jnp.where(weights[i] > 0, updated, mem[y])
        return mem.at[y].set(updated)

    return jax.lax.fori_loop(0, embeds.shape[0], body, memory)


def param_free_layernorm(x, eps: float = 1e-6):
    """(x − mean) / (std + eps) over the last dim, torch-std (ddof=1)
    (nl.py:7-15)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.std(x, axis=-1, keepdims=True, ddof=1)
    return (x - mean) / (std + eps)


class NonLocal1D(nn.Module):
    """Support-batch ↔ class-memory attention (nl.py:18-159).

    Upstream feeds [N,C] support embeddings and the [M,C] memory through 1x1
    Conv1d layers after reshaping to [1,C,N]; every conv is therefore a Dense.
    Attention: softmax(θ(x) · φ(q)ᵀ / √C) · g(q), parameter-free LayerNorm,
    ReLU → W (Dense) → BatchNorm(init γ=0,β=0) → dropout(0.2) → residual +x.

    The zero-init BN makes the block start as identity. BatchNorm here is the
    torch BatchNorm1d over [1,C,N]: per-channel stats across the N support
    samples (eps 1e-5, torch momentum 0.1).
    """

    channels: int
    inter_channels: int
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_support, query, train: bool = False):
        c_i = self.inter_channels
        theta = dense_torch(c_i, self.channels, "theta", self.dtype)(x_support)
        phi = dense_torch(c_i, self.channels, "phi", self.dtype)(query)
        g = dense_torch(c_i, self.channels, "g", self.dtype)(query)

        f = (theta @ phi.T) / math.sqrt(c_i)  # [N, M]
        attn = jax.nn.softmax(f, axis=-1)
        y = attn @ g  # [N, C_i]
        y = param_free_layernorm(y)
        y = nn.relu(y)
        y = dense_torch(self.channels, c_i, "w", self.dtype)(y)
        y = TorchBatchNorm(
            use_running_average=not train,
            epsilon=1e-5,
            momentum=0.9,
            scale_init=nn.initializers.zeros,
            fast_variance=False,  # near-identical rows: see TorchBatchNorm
            dtype=self.dtype,
            name="w_bn",
        )(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y + x_support


class NonLocalND(nn.Module):
    """Self-attention non-local block over a feature map's positions —
    the NONLocalBlock2D/3D wrappers (nl.py:161-184; unused by the reference's
    main path, provided for capability parity).

    Input is channels-last: [B, *spatial, C] (2D: [B,H,W,C]; 3D:
    [B,T,H,W,C]). Positions flatten to one sequence and attention runs as
    batched matmuls on the MXU — the upstream 1x1 convs are Dense layers over
    the channel dim. ``sub_sample`` max-pools φ/g spatially by 2 (temporal
    dim untouched, matching the (1,2,2) 3D pool) before flattening.
    """

    channels: int
    inter_channels: int
    sub_sample: bool = False
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        c_i = self.inter_channels
        kv = x
        if self.sub_sample:
            ndim = len(spatial)
            window = (1,) * (ndim - 2) + (2, 2) if ndim >= 2 else (2,)
            kv = nn.max_pool(x, window, strides=window)
        seq_q = x.reshape(b, -1, c)
        seq_kv = kv.reshape(b, -1, c)
        theta = dense_torch(c_i, c, "theta", self.dtype)(seq_q)
        phi = dense_torch(c_i, c, "phi", self.dtype)(seq_kv)
        g = dense_torch(c_i, c, "g", self.dtype)(seq_kv)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi) / math.sqrt(c_i), axis=-1
        )
        y = jnp.einsum("bnm,bmc->bnc", attn, g)
        y = param_free_layernorm(y)
        y = nn.relu(y)
        y = dense_torch(c, c_i, "w", self.dtype)(y)
        y = TorchBatchNorm(
            use_running_average=not train,
            epsilon=1e-5,
            momentum=0.9,
            scale_init=nn.initializers.zeros,
            fast_variance=False,  # near-identical rows: see TorchBatchNorm
            dtype=self.dtype,
            name="w_bn",
        )(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return (y + seq_q).reshape(x.shape)


class SemanticAdaptor(nn.Module):
    """MLP 512→640→768→896→semantic_dim with inner ReLUs
    (resnet18_vasa.py:75-89)."""

    semantic_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(dense_torch(640, 512, "fc", self.dtype)(x))
        x = nn.relu(dense_torch(768, 640, "fc2", self.dtype)(x))
        x = nn.relu(dense_torch(896, 768, "fc3", self.dtype)(x))
        return dense_torch(self.semantic_dim, 896, "fc4", self.dtype)(x)
