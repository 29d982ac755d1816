"""BN-folding / space-to-depth / fused-preprocess inference-trunk parity.

The production eval path (retrieval/features.make_feat_fn folded=True) must be
numerically equivalent to the trained module's eval graph
(resnet_f2f.ResNet18F2F train=False) — these tests pin that equivalence at
fp32 for every stem mode, plus the feat_fn-level wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqwild_tpu.core.config import ModelConfig
from vqwild_tpu.models import build_model, init_model
from vqwild_tpu.models.fold import (
    make_embed_fn,
    make_folded_trunk,
    space_to_depth,
    stem_to_space_to_depth,
    yuv420_center_s2d,
)
from vqwild_tpu.ops.preprocess import (
    normalize_clips,
    normalize_clips_yuv420,
    rgb_to_yuv420_host,
)


def _setup(rng_seed=1, crop=32):
    model = build_model(ModelConfig(method="baseline", nclass=200))
    params, state = init_model(model, jax.random.PRNGKey(0), (1, 2, crop, crop, 3))
    rng = np.random.default_rng(rng_seed)

    def perturb(path, a):
        name = str(getattr(path[-1], "key", path[-1]))
        d = 0.05 * rng.normal(size=a.shape).astype(a.dtype)
        return a + (np.abs(d) if name == "var" else d)

    bs = jax.tree_util.tree_map_with_path(perturb, state["batch_stats"])
    return model, {"params": params, "batch_stats": bs}


def _smooth_rgb(rng, b=2, t=3, s=32):
    """Chroma-smooth in-gamut frames: the fused path drops the out-of-gamut
    clip, so parity is asserted on content where the clip is inactive (real
    JPEG-decoded content; random per-pixel noise is not in 4:2:0 gamut)."""
    base = rng.integers(40, 200, (b, t, 1, 1, 3)).astype(np.int64)
    grad = (np.arange(s)[:, None] + np.arange(s)[None, :])[None, None, :, :, None] // 2
    return np.clip(base + grad, 0, 255).astype(np.uint8)


def _ref_embed(model, variables, clips):
    fe = model.apply(variables, clips, train=False).frame_embed
    fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-12)
    return jnp.transpose(fe, (0, 2, 1))


class TestStemTransforms:
    def test_s2d_kernel_zero_taps(self):
        k = np.random.default_rng(0).normal(size=(7, 7, 3, 64)).astype(np.float32)
        ks = stem_to_space_to_depth(k)
        assert ks.shape == (4, 4, 12, 64)
        # tap (a=0, r=0) maps to source kh=-1 → zero row
        np.testing.assert_array_equal(ks[0, :, 0:3], 0.0)
        np.testing.assert_array_equal(ks[:, 0, np.arange(0, 12, 6)], 0.0)

    def test_space_to_depth_roundtrip_order(self):
        x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
        s = np.asarray(space_to_depth(jnp.asarray(x)))
        # channel (dh*2+dw)*3 + c
        assert s.shape == (2, 2, 2, 12)
        np.testing.assert_array_equal(s[0, 0, 0, 0:3], x[0, 0, 0])
        np.testing.assert_array_equal(s[0, 0, 0, 3:6], x[0, 0, 1])
        np.testing.assert_array_equal(s[0, 0, 0, 6:9], x[0, 1, 0])
        np.testing.assert_array_equal(s[0, 0, 0, 9:12], x[0, 1, 1])

    def test_yuv_center_matches_normalize(self):
        """Centered-YUV feed ≡ normalized RGB through the linear map: check
        the zero point — the YUV triple of ImageNet-mean gray maps to 0."""
        from vqwild_tpu.models.fold import YUV_ZERO_CB, YUV_ZERO_CR, YUV_ZERO_Y

        y = np.full((1, 1, 2, 2), round(YUV_ZERO_Y), np.uint8)
        uv = np.full((1, 1, 1, 1, 2), 0, np.uint8)
        uv[..., 0] = round(128 + YUV_ZERO_CB)
        uv[..., 1] = round(128 + YUV_ZERO_CR)
        v = np.asarray(yuv420_center_s2d(y, uv, jnp.float32))
        assert np.abs(v).max() < 0.5  # within rounding of the zero point


class TestFoldedTrunkParity:
    @pytest.mark.parametrize("stem_mode", ["conv7", "s2d"])
    def test_folded_matches_full_eval(self, stem_mode):
        model, variables = _setup()
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 32, 32, 3)).astype(np.float32)
        ref = model.apply(variables, jnp.asarray(x), train=False).frame_embed
        im, iv = make_folded_trunk(variables, stem_mode=stem_mode)
        got = im.apply(iv, jnp.asarray(x))
        scale = float(jnp.max(jnp.abs(ref)))
        assert scale > 0.01  # non-degenerate fixture
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_yuv_fused_matches_full_eval(self):
        model, variables = _setup()
        rng = np.random.default_rng(3)
        rgb = _smooth_rgb(rng)
        y, uv = rgb_to_yuv420_host(rgb)
        clips = normalize_clips_yuv420(jnp.asarray(y), jnp.asarray(uv))
        ref = _ref_embed(model, variables, clips)
        f = make_embed_fn(variables, dtype=jnp.float32, stem_mode="yuv_s2d")
        got = f(jnp.asarray(y), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_out_of_gamut_divergence_bounded(self):
        """The fused yuv_s2d stem is linear and drops normalize_clips_yuv420's
        out-of-gamut clip (the ONE documented inexactness of the fused eval
        path). Bound it adversarially: even frames that are entirely
        saturated luma x extreme chroma — far beyond anything a JPEG source
        contains — keep embedding cosine > 0.98 vs the clipping path."""
        model, variables = _setup()
        rng = np.random.default_rng(13)
        y = rng.choice([0, 255], size=(4, 2, 32, 32)).astype(np.uint8)
        uv = rng.choice([0, 255], size=(4, 2, 16, 16, 2)).astype(np.uint8)

        f_fused = make_embed_fn(variables, dtype=jnp.float32, stem_mode="yuv_s2d")
        a = np.asarray(f_fused(jnp.asarray(y), jnp.asarray(uv)))
        clips = normalize_clips_yuv420(jnp.asarray(y), jnp.asarray(uv))
        b = np.asarray(_ref_embed(model, variables, clips))
        cos = np.sum(a * b, axis=1)
        assert cos.min() > 0.98, cos.min()

    def test_nondefault_bn_eps_threads_through_folding(self):
        """A trunk trained with bn_eps != 1e-3 must fold with ITS eps, not
        the default — the scale gamma/sqrt(var+eps) is wrong otherwise."""
        eps = 1e-1  # large eps makes a silent default-eps fold visibly wrong
        model = build_model(ModelConfig(method="baseline", nclass=200, bn_eps=eps))
        params, state = init_model(model, jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
        rng = np.random.default_rng(9)

        def perturb(path, a):
            name = str(getattr(path[-1], "key", path[-1]))
            d = 0.05 * rng.normal(size=a.shape).astype(a.dtype)
            return a + (np.abs(d) if name == "var" else d)

        bs = jax.tree_util.tree_map_with_path(perturb, state["batch_stats"])
        variables = {"params": params, "batch_stats": bs}
        x = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
        ref = model.apply(variables, jnp.asarray(x), train=False).frame_embed
        im, iv = make_folded_trunk(variables, bn_eps=eps)
        got = im.apply(iv, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        # the default-eps fold must NOT match (proves eps actually matters)
        im_bad, iv_bad = make_folded_trunk(variables)
        bad = im_bad.apply(iv_bad, jnp.asarray(x))
        assert float(jnp.max(jnp.abs(bad - ref))) > 1e-3

    def test_pallas_stem_embed_fn_matches_xla(self):
        """stem_impl="pallas" (fused stem+maxpool kernel) ≡ the XLA graph."""
        model, variables = _setup()
        rng = np.random.default_rng(7)
        rgb = _smooth_rgb(rng)
        y, uv = rgb_to_yuv420_host(rgb)
        f_xla = make_embed_fn(variables, dtype=jnp.float32, stem_mode="yuv_s2d")
        f_pal = make_embed_fn(
            variables, dtype=jnp.float32, stem_mode="yuv_s2d", stem_impl="pallas"
        )
        a = f_xla(jnp.asarray(y), jnp.asarray(uv))
        b = f_pal(jnp.asarray(y), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    def test_rgb_embed_fn_matches_full_eval(self):
        model, variables = _setup()
        rng = np.random.default_rng(4)
        rgb = _smooth_rgb(rng)
        ref = _ref_embed(model, variables, normalize_clips(jnp.asarray(rgb)))
        f = make_embed_fn(variables, dtype=jnp.float32, stem_mode="conv7")
        got = f(jnp.asarray(rgb))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestFeatFnFolded:
    @pytest.mark.parametrize("wire", ["rgb", "yuv420"])
    def test_folded_feat_fn_matches_unfolded(self, wire):
        from vqwild_tpu.retrieval.features import make_feat_fn

        model, variables = _setup()
        rng = np.random.default_rng(5)
        rgb = _smooth_rgb(rng, b=3)
        f_fold = make_feat_fn(model, variables, wire=wire, folded=True)
        f_full = make_feat_fn(model, variables, wire=wire, folded=False)
        args = (rgb,) if wire == "rgb" else rgb_to_yuv420_host(rgb)
        a, b = f_fold(*args), f_full(*args)
        assert a.shape == b.shape == (3, 512, 3)
        cos = np.sum(a * b, axis=1)
        assert cos.min() > 0.9999
