import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vqwild_tpu.ops.distance import pairwise_sq_l2
from vqwild_tpu.ops.pallas_kernels import pairwise_sq_l2_pallas, stem_s2d_pool_pallas

INTERPRET = jax.default_backend() != "tpu"


class TestPallasPairwiseL2:
    @pytest.mark.parametrize("shape", [(128, 128, 512), (64, 200, 32), (300, 130, 512)])
    def test_matches_xla(self, shape):
        nq, ng, d = shape
        rng = np.random.default_rng(0)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        g = rng.normal(size=(ng, d)).astype(np.float32)
        got = np.asarray(pairwise_sq_l2_pallas(q, g, interpret=INTERPRET))
        want = np.asarray(pairwise_sq_l2(q, g))
        assert got.shape == (nq, ng)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)

    def test_nonnegative_and_zero_diag(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(130, 64)).astype(np.float32)
        d = np.asarray(pairwise_sq_l2_pallas(x, x, interpret=INTERPRET))
        assert (d >= 0).all()
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-3)


class TestPallasFusedStem:
    """stem_s2d_pool_pallas ≡ the folded trunk's stem block (conv 4x4/1 pad
    (2,1) + bias + ReLU + 3x3/2 maxpool pad 1 — fold.ResNet18F2FInfer)."""

    @staticmethod
    def _ref(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)
        y = jax.nn.relu(y).astype(x.dtype)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    # n=5 exercises the STEM_F remainder padding; 16x16 is the test-crop feed
    @pytest.mark.parametrize("n,hw", [(5, 16), (4, 12)])
    def test_matches_xla_stem(self, n, hw):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((n, hw, hw, 6)).astype(np.float32))
        k = jnp.asarray(0.1 * rng.standard_normal((4, 4, 6, 64)).astype(np.float32))
        b = jnp.asarray(0.1 * rng.standard_normal((64,)).astype(np.float32))
        got = stem_s2d_pool_pallas(x, k, b, interpret=INTERPRET)
        want = self._ref(x, k, b)
        assert got.shape == (n, hw // 2, hw // 2, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_xla_stem_bf16(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((3, 12, 12, 6))).astype(jnp.bfloat16)
        k = jnp.asarray(0.1 * rng.standard_normal((4, 4, 6, 64))).astype(jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.standard_normal((64,))).astype(jnp.bfloat16)
        got = stem_s2d_pool_pallas(x, k, b, interpret=INTERPRET)
        want = self._ref(x, k, b)
        # accumulation order differs from XLA's conv → final bf16 cast can
        # land 1 ULP apart (ULP ≈ 0.016 at magnitude 2)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
        )
