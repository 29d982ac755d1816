import jax.numpy as jnp
import numpy as np

from vqwild_tpu.ops import preprocess


class TestPreprocessParity:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.frames = rng.integers(0, 255, (3, 2, 40, 48, 3), dtype=np.uint8)
        self.offsets = np.array([[0, 0], [5, 9], [8, 16]], np.int32)
        self.flips = np.array([False, True, False])

    def test_device_path_matches_host(self):
        dev = np.asarray(
            preprocess.preprocess_clips(self.frames, self.offsets, self.flips, 32)
        )
        host = preprocess.preprocess_host(self.frames, self.offsets, self.flips, 32)
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_production_split_matches_host(self):
        """host crop/flip + device normalize == full host path."""
        cropped = preprocess.crop_clips_host(self.frames, self.offsets, self.flips, 32)
        dev = np.asarray(preprocess.normalize_clips(cropped))
        host = preprocess.preprocess_host(self.frames, self.offsets, self.flips, 32)
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_normalize_dtype(self):
        cropped = preprocess.crop_clips_host(self.frames, self.offsets, self.flips, 32)
        out = preprocess.normalize_clips(cropped, out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
