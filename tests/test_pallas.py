import jax
import numpy as np
import pytest

from vqwild_tpu.ops.distance import pairwise_sq_l2
from vqwild_tpu.ops.pallas_kernels import pairwise_sq_l2_pallas

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
