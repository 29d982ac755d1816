"""Inference-time trunk optimizations: BN constant-folding + space-to-depth stem.

The trained trunk (resnet_f2f.ResNet18F2F) interleaves every conv with a
BatchNorm. At eval time BN is an affine constant, so it folds into the conv:

    BN(x*W) = gamma*(x*W - mu)/sqrt(var+eps) + beta
            = x*(W * s) + (beta - mu*s),   s = gamma/sqrt(var+eps)

``fold_trunk_params`` performs that pytree transform once (fp32, no retrace),
producing parameters for ``ResNet18F2FInfer`` — the same topology with biased
convs and no BN, which removes 20 affine passes from the eval graph.

``space_to_depth=True`` additionally rewrites the 7x7/2 stem conv (3 input
channels — the classic low-MXU-utilization op; cuDNN has a special path for
it, reference resnet18_3d_f2f.py:80-84) as a mathematically identical 4x4/1
conv over 2x2-block-reshaped input with 12 channels (the MLPerf-ResNet TPU
trick): y[p] = sum_k w[k] x[2p+k-3] becomes, with xs[q,r] = x[2q+r],
a 4-tap conv over q with taps a' in {-2..1} and ws[a',r] = w[2a'+r+3]
(zero where out of range), padding (2,1) per spatial dim.

Both are exact rewrites of the eval forward; parity is asserted in
tests/test_models.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _fold_one(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps):
    """HWIO kernel + BN stats → (folded kernel, bias), fp32."""
    k = np.asarray(kernel, np.float32)
    s = np.asarray(bn_scale, np.float32) / np.sqrt(
        np.asarray(bn_var, np.float32) + eps
    )
    bias = np.asarray(bn_bias, np.float32) - np.asarray(bn_mean, np.float32) * s
    return k * s[None, None, None, :], bias


def stem_to_space_to_depth(kernel, block: int = 2):
    """[7,7,3,64] stem kernel → [4,4,12,64] kernel for the 2x2 s2d input.

    ks[a, b, (r*block+s)*C + c, o] = k[2(a-2)+r+3, 2(b-2)+s+3, c, o]
    with out-of-range source taps zero.
    """
    assert block == 2, "only 2x2 space-to-depth implemented"
    k = np.asarray(kernel, np.float32)
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (7, 7), k.shape
    ks = np.zeros((4, 4, block * block * cin, cout), np.float32)
    for a in range(4):
        for r in range(block):
            sh = 2 * (a - 2) + r + 3
            if not 0 <= sh < kh:
                continue
            for b in range(4):
                for s in range(block):
                    sw = 2 * (b - 2) + s + 3
                    if not 0 <= sw < kw:
                        continue
                    ks[a, b, (r * block + s) * cin : (r * block + s + 1) * cin] = k[
                        sh, sw
                    ]
    return ks


def space_to_depth(x, block: int = 2):
    """[N, H, W, C] → [N, H/b, W/b, b*b*C]; channel order (dh, dw, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // block, w // block, block * block * c)


def fold_trunk_params(trunk_params, trunk_batch_stats, *, space_to_depth_stem=False,
                      bn_eps: float = 1e-3, downsample_bn_eps: float = 1e-5):
    """Trained trunk params + batch_stats → ResNet18F2FInfer params (fp32).

    BN eps values mirror the trained module: block/stem BNs 1e-3, downsample
    BNs torch-default 1e-5 (resnet18_3d_f2f.py:85, :24 — the reference quirk
    preserved by resnet_f2f.BasicBlock).
    """
    p, bs = trunk_params, trunk_batch_stats
    out = {}

    # stem
    k, b = _fold_one(
        p["conv1"]["kernel"], p["bn1"]["scale"], p["bn1"]["bias"],
        bs["bn1"]["mean"], bs["bn1"]["var"], bn_eps,
    )
    if space_to_depth_stem:
        k = stem_to_space_to_depth(k)
    out["conv1"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}

    for name in p:
        if not name.startswith("layer"):
            continue
        blk_p, blk_s = p[name], bs[name]
        folded = {}
        for conv, bn, eps in (
            ("conv1", "bn1", bn_eps),
            ("conv2", "bn2", bn_eps),
            ("downsample_conv", "downsample_bn", downsample_bn_eps),
        ):
            if conv not in blk_p:
                continue
            k, b = _fold_one(
                blk_p[conv]["kernel"], blk_p[bn]["scale"], blk_p[bn]["bias"],
                blk_s[bn]["mean"], blk_s[bn]["var"], eps,
            )
            folded[conv] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        out[name] = folded
    return out


class BasicBlockInfer(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv3x3(planes, stride, name):
            return nn.Conv(
                planes, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), use_bias=True,
                dtype=self.dtype, name=name,
            )

        residual = x
        y = nn.relu(conv3x3(self.planes, self.stride, "conv1")(x))
        y = conv3x3(self.planes, 1, "conv2")(y)
        if self.use_projection:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=True, dtype=self.dtype, name="downsample_conv",
            )(x)
        return nn.relu(y + residual)


class ResNet18F2FInfer(nn.Module):
    """BN-folded eval trunk: [B,T,...] float → [B,T,512] fp32 features.

    Same math as ResNet18F2F(train=False) on folded params. ``stem_mode``:
      * "conv7"  — input [B,T,H,W,3], the trained 7x7/2 stem.
      * "s2d"    — input [B,T,H,W,3], space-to-depth + 4x4/1 stem (even H,W).
      * "yuv_s2d"— input [B,T,H/2,W/2,6] pre-centered planes from
        fold.yuv420_center_s2d; preprocess is folded into the stem kernel.
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_planes: Sequence[int] = (64, 128, 256, 512)
    stem_mode: str = "conv7"
    dtype: Any = jnp.float32
    skip_stem: bool = False  # input is already the pooled stem output

    @nn.compact
    def __call__(self, x):
        b, t = x.shape[0], x.shape[1]
        x = x.reshape((b * t,) + x.shape[2:]).astype(self.dtype)

        if self.skip_stem:
            # [B,T,H',W',64] pre-stemmed feed (e.g. the fused Pallas
            # stem+maxpool kernel, ops/pallas_kernels.stem_s2d_pool_pallas).
            pass
        elif self.stem_mode in ("s2d", "yuv_s2d"):
            if self.stem_mode == "s2d":
                x = space_to_depth(x, 2)
            x = nn.Conv(
                64, (4, 4), strides=(1, 1), padding=((2, 1), (2, 1)),
                use_bias=True, dtype=self.dtype, name="conv1",
            )(x)
        else:
            assert self.stem_mode == "conv7", self.stem_mode
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=True, dtype=self.dtype, name="conv1",
            )(x)
        if not self.skip_stem:
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (nblocks, planes) in enumerate(
            zip(self.stage_sizes, self.stage_planes), start=1
        ):
            for bi in range(nblocks):
                stride = 2 if (li > 1 and bi == 0) else 1
                x = BasicBlockInfer(
                    planes=planes, stride=stride,
                    use_projection=(stride != 1 or inplanes != planes),
                    dtype=self.dtype, name=f"layer{li}_{bi}",
                )(x)
                inplanes = planes

        feats = jnp.mean(x, axis=(1, 2))
        return feats.reshape(b, t, -1).astype(jnp.float32)


# BT.601 full-range: rgb = A @ [y, cb-128, cr-128] (ops/preprocess.py:136-152)
_BT601_A = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], np.float32
)
_IMAGENET_MEAN255 = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
_IMAGENET_INV_STD = 1.0 / np.array([0.229, 0.224, 0.225], np.float32)

# The YUV triple whose (unclipped) decode+normalize is exactly 0 — inputs are
# centered on it so the conv's zero padding stays equivalent to the reference
# graph's zero padding of normalized-RGB.
_YUV_ZERO = np.linalg.solve(_BT601_A, _IMAGENET_MEAN255).astype(np.float32)
YUV_ZERO_Y = float(_YUV_ZERO[0])
YUV_ZERO_CB = float(_YUV_ZERO[1])  # relative to 128
YUV_ZERO_CR = float(_YUV_ZERO[2])


def stem_to_yuv_s2d(kernel, block: int = 2):
    """[7,7,3,64] RGB stem kernel → [4,4,6,64] kernel over centered YUV420 s2d
    input (channels: y00, y01, y10, y11, cb, cr).

    Folds the entire device preprocess — nearest chroma upsample, BT.601
    full-range YUV→RGB, /255 + ImageNet normalize — into the stem conv's
    channel mixing: x[pos, c] = S_c * (A @ [y[pos]-y0, cb-cb0, cr-cr0])_c,
    so k_yuv[..., y_pos] = sum_c k_s2d[..., pos*3+c] * S_c * A[c, 0] and the
    shared chroma channels accumulate over all 4 positions. Exact apart from
    the dropped out-of-gamut clip (normalize_clips_yuv420 clips decoded RGB
    to [0,255]; in-gamut pixels are bit-identical in fp32).
    """
    ks = stem_to_space_to_depth(kernel, block)  # [4,4,12,64]
    npos = block * block
    cin = 3
    sa = _IMAGENET_INV_STD[:, None] / 255.0 * _BT601_A  # [c, j] = S_c * A[c,j]
    out = np.zeros(ks.shape[:2] + (npos + 2, ks.shape[3]), np.float32)
    for pos in range(npos):
        kc = ks[:, :, pos * cin : (pos + 1) * cin]  # [4,4,3,64]
        out[:, :, pos] = np.einsum("hwco,c->hwo", kc, sa[:, 0])
        out[:, :, npos] += np.einsum("hwco,c->hwo", kc, sa[:, 1])
        out[:, :, npos + 1] += np.einsum("hwco,c->hwo", kc, sa[:, 2])
    return out


def yuv420_center_s2d(y_u8, uv_u8, out_dtype=jnp.bfloat16):
    """(Y [...,H,W], UV [...,H/2,W/2,2]) uint8 → centered [...,H/2,W/2,6].

    The device-side feed for the yuv-fused stem: space-to-depth the luma,
    append block chroma, subtract the YUV zero point. Pure reshape/convert —
    no chroma upsample, no RGB materialization.
    """
    y = jnp.asarray(y_u8)
    lead = y.shape[:-2]
    h, w = y.shape[-2], y.shape[-1]
    ys = y.reshape(lead + (h // 2, 2, w // 2, 2))
    ys = jnp.moveaxis(ys, -3, -2)  # [..., h/2, w/2, 2, 2]
    ys = ys.reshape(lead + (h // 2, w // 2, 4)).astype(out_dtype) - jnp.asarray(
        YUV_ZERO_Y, out_dtype
    )
    uv = jnp.asarray(uv_u8).astype(out_dtype) - jnp.asarray(
        [128.0 + YUV_ZERO_CB, 128.0 + YUV_ZERO_CR], out_dtype
    )
    return jnp.concatenate([ys, uv], axis=-1)


def make_folded_trunk(variables, *, dtype=jnp.float32, stem_mode: str = "conv7",
                      bn_eps: float = 1e-3):
    """(infer_model, infer_variables) from full-model variables.

    ``variables`` must hold params/trunk and batch_stats/trunk as produced by
    models.init_model / the torch importer. ``stem_mode`` as in
    ResNet18F2FInfer; for "yuv_s2d" the BN-folded stem kernel is additionally
    pushed through stem_to_yuv_s2d (preprocess folded in). ``bn_eps`` must
    match the TRAINED module's block/stem BN epsilon (ModelConfig.bn_eps;
    the downsample BNs keep the torch-default 1e-5 regardless — the
    reference quirk, resnet_f2f.BasicBlock).
    """
    assert stem_mode in ("conv7", "s2d", "yuv_s2d"), stem_mode
    folded = fold_trunk_params(
        variables["params"]["trunk"],
        variables["batch_stats"]["trunk"],
        space_to_depth_stem=(stem_mode == "s2d"),
        bn_eps=bn_eps,
    )
    if stem_mode == "yuv_s2d":
        folded["conv1"] = {
            "kernel": jnp.asarray(stem_to_yuv_s2d(np.asarray(folded["conv1"]["kernel"]))),
            "bias": folded["conv1"]["bias"],
        }
    model = ResNet18F2FInfer(dtype=dtype, stem_mode=stem_mode)
    return model, {"params": folded}


def make_embed_fn(variables, *, dtype=jnp.bfloat16, stem_mode: str = "yuv_s2d",
                  bn_eps: float = 1e-3, stem_impl: str = "xla"):
    """The fused production embedding graph (NOT jitted; wrap at the call
    site). Returns f whose signature matches the wire:

      * stem_mode "yuv_s2d": f(y_u8 [B,T,H,W], uv_u8 [B,T,H/2,W/2,2])
      * "conv7"/"s2d":       f(clips [B,T,H,W,3] uint8 or float)

    → L2-normalized frame embeddings [B, C, T] fp32 (the reference feat_func
    contract, main.py:220-233). All eval-time preprocessing folds into the
    trunk: BN constants into conv weights, and for "yuv_s2d" the chroma
    upsample + BT.601 + ImageNet normalize into the stem itself.

    ``stem_impl="pallas"`` (yuv_s2d only) runs the stem conv + ReLU + 3x3/2
    maxpool as one fused Pallas kernel so the pre-pool activation never
    round-trips HBM (docs/TRUNK_PROFILE.md's last lever); off-TPU it runs in
    interpret mode automatically.
    """
    import jax

    model, iv = make_folded_trunk(variables, dtype=dtype, stem_mode=stem_mode,
                                  bn_eps=bn_eps)

    def head(fe):
        fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-12)
        return jnp.transpose(fe, (0, 2, 1))

    if stem_impl == "pallas":
        from vqwild_tpu.ops.pallas_kernels import stem_s2d_pool_pallas

        assert stem_mode == "yuv_s2d", "pallas stem requires stem_mode=yuv_s2d"
        interp = jax.default_backend() != "tpu"
        post = ResNet18F2FInfer(dtype=dtype, skip_stem=True)
        conv1 = iv["params"]["conv1"]
        k = jnp.asarray(conv1["kernel"], dtype)
        bias = jnp.asarray(conv1["bias"], dtype)
        pv = {"params": {n: p for n, p in iv["params"].items() if n != "conv1"}}

        def f(y_u8, uv_u8):
            x = yuv420_center_s2d(y_u8, uv_u8, dtype)
            bsz, t = x.shape[0], x.shape[1]
            pooled = stem_s2d_pool_pallas(
                x.reshape((bsz * t,) + x.shape[2:]), k, bias, interpret=interp
            )
            return head(post.apply(pv, pooled.reshape((bsz, t) + pooled.shape[1:])))

    elif stem_mode == "yuv_s2d":

        def f(y_u8, uv_u8):
            return head(model.apply(iv, yuv420_center_s2d(y_u8, uv_u8, dtype)))

    else:
        from vqwild_tpu.ops.preprocess import normalize_clips

        def f(clips):
            if clips.dtype == jnp.uint8:
                clips = normalize_clips(clips, out_dtype=dtype)
            return head(model.apply(iv, clips))

    return f
