"""Frame-to-frame inflated ResNet18 trunk, TPU-native.

The reference's three backbones share one trunk: a 3D ResNet18 in which every
conv kernel is (1, k, k) — temporal extent exactly 1 (resnet18_3d_f2f.py:6-133).
A (1,k,k) 3D conv over [B,C,T,H,W] is mathematically identical to a 2D conv
over [B*T,C,H,W]; we therefore fold T into the batch dimension and run plain
NHWC 2D convs, which XLA tiles directly onto the MXU (no degenerate temporal
dimension to confuse layout assignment).

Faithful details (for .pth checkpoint output-parity):
* stem: Conv 7x7/2 pad 3 (no bias) → BN(eps=1e-3, torch momentum 0.01) → ReLU
  → MaxPool 3x3/2 pad 1                      (resnet18_3d_f2f.py:80-93)
* layer1..4: BasicBlock×2, channels 64/128/256/512, spatial stride 2 in
  layers 2-4; block BNs use eps=1e-3/momentum .01, but the *downsample* BN is
  a default BatchNorm (eps=1e-5, momentum 0.1)  (resnet18_3d_f2f.py:113-133)
* the ``maxpool2`` after layer1 is a 1x1/1 no-op upstream — omitted.
* init: Kaiming-normal fan_out on convs, BN γ=1 β=0 (resnet18_3d_f2f.py:104-111)
* output: spatial mean → per-frame 512-d features (rank_embed before the
  temporal mean, resnet18_3d_f2f.py:149-152)

Flax BatchNorm momentum = 1 - torch momentum (torch: new = (1-m)·old + m·batch).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqwild_tpu.models.heads import TorchBatchNorm

conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _Stem7x7S2D(nn.Module):
    """The 7x7/2 stem computed as a 4x4/1 conv over 2x2 space-to-depth input.

    Mathematically identical to ``nn.Conv(64, (7,7), strides 2, pad 3)`` (the
    MLPerf-ResNet stem trick, see models/fold.py:44-76) but MXU-friendly at
    *train* time too: the contraction is 4·4·12=192 wide instead of a
    stride-2 7x7 over 3 channels. The trained parameter stays the reference
    [7,7,3,64] kernel at the same pytree path (``conv1/kernel``) — the fixed
    linear kernel re-index below is inside the graph, so gradients (and thus
    Adam moments, checkpoints, the torch importer) are exactly those of the
    7x7 parameterization.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", conv_kaiming_init, (7, 7, 3, self.features), jnp.float32
        )
        # ks[a,b,(r*2+s)*3+c,o] = k[2(a-2)+r+3, 2(b-2)+s+3, c, o] (zero where
        # the source tap falls outside the 7x7 support) — static indexing,
        # exact gradient flow
        zero = jnp.zeros_like(k[0, 0])
        rows = []
        for a in range(4):
            cols = []
            for b in range(4):
                taps = []
                for r in range(2):
                    for s in range(2):
                        sh, sw = 2 * (a - 2) + r + 3, 2 * (b - 2) + s + 3
                        taps.append(
                            k[sh, sw] if 0 <= sh < 7 and 0 <= sw < 7 else zero
                        )
                cols.append(jnp.concatenate(taps, axis=0))  # [12, F]
            rows.append(jnp.stack(cols, axis=0))  # [4, 12, F]
        ks = jnp.stack(rows, axis=0).astype(self.dtype)  # [4, 4, 12, F]

        n, h, w, c = x.shape
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
            n, h // 2, w // 2, 4 * c
        )
        return jax.lax.conv_general_dilated(
            xs, ks, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99  # flax convention
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv3x3(planes, stride, name):
            return nn.Conv(
                planes,
                (3, 3),
                strides=(stride, stride),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                kernel_init=conv_kaiming_init,
                dtype=self.dtype,
                name=name,
            )

        def bn(name, eps=None, momentum=None):
            return TorchBatchNorm(
                use_running_average=not train,
                epsilon=self.bn_eps if eps is None else eps,
                momentum=self.bn_momentum if momentum is None else momentum,
                dtype=self.dtype,
                name=name,
            )

        residual = x
        y = conv3x3(self.planes, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv3x3(self.planes, 1, "conv2")(y)
        y = bn("bn2")(y)
        if self.use_projection:
            residual = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=conv_kaiming_init,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            # upstream downsample BN keeps torch defaults (eps 1e-5, mom 0.1)
            residual = bn("downsample_bn", eps=1e-5, momentum=0.9)(residual)
        return nn.relu(y + residual)


class ResNet18F2F(nn.Module):
    """Trunk: [B, T, H, W, C] float → per-frame features [B, T, 512]."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_planes: Sequence[int] = (64, 128, 256, 512)
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    stem_s2d: bool = False  # same math, MXU-friendly lowering (_Stem7x7S2D)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[0], x.shape[1]
        x = x.reshape((b * t,) + x.shape[2:]).astype(self.dtype)

        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _Stem7x7S2D(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                kernel_init=conv_kaiming_init,
                dtype=self.dtype,
                name="conv1",
            )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            epsilon=self.bn_eps,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (nblocks, planes) in enumerate(
            zip(self.stage_sizes, self.stage_planes), start=1
        ):
            for bi in range(nblocks):
                stride = 2 if (li > 1 and bi == 0) else 1
                x = BasicBlock(
                    planes=planes,
                    stride=stride,
                    use_projection=(stride != 1 or inplanes != planes),
                    bn_eps=self.bn_eps,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, train=train)
                inplanes = planes

        # spatial mean → per-frame embedding (resnet18_3d_f2f.py:149-151)
        feats = jnp.mean(x, axis=(1, 2))
        return feats.reshape(b, t, -1).astype(jnp.float32)
