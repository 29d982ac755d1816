"""int8 PTQ serving trunk (models/quant.py): numerics vs the float trunk.

The quantized path is serving-only and has no reference counterpart (the
reference is fp32 torch/CUDA throughout); these tests bound its deviation
from our own folded float trunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqwild_tpu.core.config import ModelConfig
from vqwild_tpu.models import build_model, init_model
from vqwild_tpu.models import quant
from vqwild_tpu.models.fold import make_embed_fn


def _smooth_planes(rng, b, t, size):
    """Low-frequency uint8 planes (natural-image-like, not white noise)."""
    base = rng.normal(size=(b, t, size // 4, size // 4)).astype(np.float32)
    y = np.kron(base, np.ones((4, 4), np.float32))
    y = (127 + 60 * np.tanh(y)).clip(0, 255).astype(np.uint8)
    uvb = rng.normal(size=(b, t, size // 8, size // 8, 2)).astype(np.float32)
    uv = np.kron(uvb, np.ones((4, 4, 1), np.float32))
    uv = (128 + 30 * np.tanh(uv)).clip(0, 255).astype(np.uint8)
    return y, uv


@pytest.fixture(scope="module")
def trunk_setup():
    model = build_model(ModelConfig(method="baseline", nclass=10))
    params, sv = init_model(model, jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    variables = {"params": params, **sv}
    rng = np.random.default_rng(7)
    y, uv = _smooth_planes(rng, 2, 3, 32)
    return variables, (y, uv), rng


class TestQuantWeights:
    def test_weight_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        k = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
        q, sw = quant._quant_weight(k, None)
        back = q.astype(np.float32) * sw[None, None, None, :]
        # symmetric per-channel: error <= half a step per element
        step = sw[None, None, None, :]
        assert np.all(np.abs(back - k) <= 0.5 * step + 1e-7)
        assert q.dtype == np.int8

    def test_input_scale_folding(self):
        rng = np.random.default_rng(1)
        k = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
        s_in = np.array([0.5, 1.0, 2.0, 4.0], np.float32)
        q, sw = quant._quant_weight(k, s_in)
        back = q.astype(np.float32) * sw[None, None, None, :]
        np.testing.assert_allclose(
            back, k * s_in[None, None, :, None], atol=0.5 * sw.max()
        )


class TestStemFeed:
    def test_center_s2d_int8_matches_float_within_one_step(self):
        from vqwild_tpu.models.fold import yuv420_center_s2d

        rng = np.random.default_rng(2)
        y = rng.integers(0, 255, (1, 2, 8, 8), dtype=np.uint8)
        uv = rng.integers(0, 255, (1, 2, 4, 4, 2), dtype=np.uint8)
        scales = quant._stem_input_scales()
        xi = np.asarray(quant._center_s2d_int8(
            y.reshape(2, 8, 8), uv.reshape(2, 4, 4, 2), scales))
        xf = np.asarray(yuv420_center_s2d(
            y.reshape(2, 8, 8), uv.reshape(2, 4, 4, 2), jnp.float32))
        back = xi.astype(np.float32) * scales
        assert np.all(np.abs(back - xf) <= 0.55 * scales)
        # full u8 range fits: no saturation at 0 or 255
        assert xi.min() >= -127 and xi.max() <= 127

    def test_maxpool_i8_matches_float_pool(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-127, 127, (2, 8, 8, 4), dtype=np.int8)
        got = np.asarray(quant._maxpool_i8(jnp.asarray(x)))
        import flax.linen as nn

        want = np.asarray(nn.max_pool(
            jnp.asarray(x, jnp.float32), (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)),
        ))
        # int8 pool pads with -128 (< any value) — identical selection
        np.testing.assert_array_equal(got.astype(np.float32), want)


class TestEndToEnd:
    def test_embedding_cosine_vs_float_trunk(self, trunk_setup):
        variables, calib, rng = trunk_setup
        f_int8 = quant.make_int8_embed_fn(variables, calib)
        f_float = jax.jit(make_embed_fn(
            variables, dtype=jnp.float32, stem_mode="yuv_s2d"))

        y, uv = _smooth_planes(rng, 3, 2, 32)
        a = np.asarray(f_int8(y, uv))  # [B, C, T]
        b = np.asarray(f_float(y, uv))
        assert a.shape == b.shape
        cos = np.sum(a * b, axis=1)  # both L2-normalized over C
        assert cos.min() > 0.98, cos.min()

    def test_deterministic(self, trunk_setup):
        variables, calib, rng = trunk_setup
        f = quant.make_int8_embed_fn(variables, calib)
        y, uv = _smooth_planes(np.random.default_rng(5), 1, 2, 32)
        a = np.asarray(f(y, uv))
        b = np.asarray(f(y, uv))
        np.testing.assert_array_equal(a, b)

    def test_make_feat_fn_int8_lazy_calibration(self, trunk_setup):
        """retrieval.features.make_feat_fn(quant='int8') calibrates on the
        first batch and then embeds every batch — including the first —
        through the int8 graph (uniform features)."""
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, _, rng = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        f = make_feat_fn(model, variables, wire="yuv420", quant="int8")
        y, uv = _smooth_planes(rng, 2, 2, 32)
        first = f(y, uv)
        again = f(y, uv)
        assert first.shape == (2, 512, 2)
        np.testing.assert_array_equal(first, again)
        norms = np.linalg.norm(first, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_make_feat_fn_int8_under_mesh(self, trunk_setup):
        """int8 extraction with batches sharded over the data axis matches
        the single-device int8 path (params replicate as jit args)."""
        from vqwild_tpu.parallel.mesh import make_mesh
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, _, _ = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        rng = np.random.default_rng(9)
        y, uv = _smooth_planes(rng, 4, 2, 32)
        f1 = make_feat_fn(model, variables, wire="yuv420", quant="int8")
        a = f1(y, uv)
        mesh = make_mesh()
        fm = make_feat_fn(model, variables, mesh=mesh, wire="yuv420", quant="int8")
        b = fm(y, uv)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_make_feat_fn_int8_requires_yuv(self, trunk_setup):
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, _, _ = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        with pytest.raises(ValueError):
            make_feat_fn(model, variables, wire="rgb", quant="int8")

    def test_ranking_agreement_vs_float(self, trunk_setup):
        """The serving question: does int8 rank a gallery like float does?"""
        variables, calib, rng = trunk_setup
        f_int8 = quant.make_int8_embed_fn(variables, calib)
        f_float = jax.jit(make_embed_fn(
            variables, dtype=jnp.float32, stem_mode="yuv_s2d"))
        y, uv = _smooth_planes(rng, 8, 2, 32)
        a = np.asarray(f_int8(y, uv)).mean(axis=2)   # clip embeds [B, C]
        b = np.asarray(f_float(y, uv)).mean(axis=2)
        q_a, g_a = a[:2], a[2:]
        q_b, g_b = b[:2], b[2:]
        ra = np.argsort(-q_a @ g_a.T, axis=1, kind="stable")
        rb = np.argsort(-q_b @ g_b.T, axis=1, kind="stable")
        # top-1 per query must agree on a smooth 6-item gallery
        np.testing.assert_array_equal(ra[:, 0], rb[:, 0])


class TestCalibrationPersistence:
    """Scales persisted beside the checkpoint (models/quant.py
    save_calibration): identical embeddings across process restarts and
    calibration-batch orderings."""

    def test_save_load_roundtrip(self, trunk_setup, tmp_path):
        variables, (y, uv), _ = trunk_setup
        calib = quant.calibrate_trunk(variables, y, uv)
        path = str(tmp_path / "int8_calib.json")
        quant.save_calibration(path, calib)
        loaded = quant.load_calibration(path)
        assert loaded == calib

    def test_calibration_path_fingerprint_and_legacy_migration(self, tmp_path):
        """calibration_path embeds the checkpoint weight fingerprint; when
        only a pre-fingerprint int8_calib.json exists it is returned
        instead — a fleet whose gallery was embedded with the old scales
        must keep loading them, never recalibrate on a fresh batch."""
        import json
        import os

        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"w")
        p = quant.calibration_path(ckpt)
        assert ".int8_calib-" in p and p.endswith(".json")
        # legacy file present, fingerprinted absent -> legacy wins (read path)
        legacy = ckpt + ".int8_calib.json"
        json.dump({"format": "vqwild-int8-calib-v1", "maxima": {}}, open(legacy, "w"))
        assert quant.calibration_path(ckpt) == legacy
        # legacy file OLDER than the weights = calibrated on a checkpoint
        # that was since retrained in place -> rejected (stale scales), the
        # fingerprinted path comes back so writers recalibrate fresh
        old = os.stat(ckpt).st_mtime - 100
        os.utime(legacy, (old, old))
        stale_p = quant.calibration_path(ckpt)
        assert stale_p != legacy and ".int8_calib-" in stale_p
        now = os.stat(ckpt).st_mtime + 1
        os.utime(legacy, (now, now))
        assert quant.calibration_path(ckpt) == legacy
        # fingerprinted file appears -> it wins again
        open(p, "w").write("{}")
        assert quant.calibration_path(ckpt) == p
        os.remove(legacy)
        os.remove(p)

        # directory checkpoints: sibling/in-dir calib files never churn the
        # weight fingerprint (else every calibration write would invalidate
        # the eval caches and re-trigger calibration forever)
        ckdir = tmp_path / "orbax_ckpt"
        ckdir.mkdir()
        (ckdir / "weights.bin").write_bytes(b"w" * 8)
        fp0 = quant.checkpoint_fingerprint(str(ckdir))
        (ckdir / "int8_calib-deadbeef00.json").write_text("{}")
        (ckdir / "weights.bin.int8_calib-cafe000000.json").write_text("{}")
        assert quant.checkpoint_fingerprint(str(ckdir)) == fp0

    def test_load_rejects_foreign_json(self, tmp_path):
        import json

        path = str(tmp_path / "bad.json")
        json.dump({"maxima": {}}, open(path, "w"))
        with pytest.raises(ValueError):
            quant.load_calibration(path)

    def test_feat_fn_pins_numerics_across_processes(self, trunk_setup, tmp_path):
        """Process A calibrates on batch A and persists; process B (fresh
        fn, DIFFERENT first batch) loads the file and embeds batch A
        identically — no first-batch-order dependence."""
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, _, _ = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        path = str(tmp_path / "calib.json")
        rng_a = np.random.default_rng(21)
        batch_a = _smooth_planes(rng_a, 2, 2, 32)

        f_a = make_feat_fn(model, variables, wire="yuv420", quant="int8",
                           calib_path=path)
        out_a = np.asarray(f_a(*batch_a))
        assert np.isfinite(out_a).all()
        import os

        assert os.path.exists(path)

        rng_b = np.random.default_rng(99)
        batch_b = _smooth_planes(rng_b, 2, 2, 32)
        f_b = make_feat_fn(model, variables, wire="yuv420", quant="int8",
                           calib_path=path)
        _ = f_b(*batch_b)  # would have been B's calibration batch
        out_b = np.asarray(f_b(*batch_a))
        np.testing.assert_array_equal(out_a, out_b)

        # and WITHOUT the persisted file the two orderings disagree —
        # the regression this feature kills
        f_c = make_feat_fn(model, variables, wire="yuv420", quant="int8")
        _ = f_c(*batch_b)
        out_c = np.asarray(f_c(*batch_a))
        assert not np.array_equal(out_a, out_c)


class TestConstParamsMode:
    def test_const_matches_arg_mode(self, trunk_setup):
        """const_params=True (params as jit constants) must produce the
        same embeddings as the default argument-passing executable."""
        variables, calib_planes, rng = trunk_setup
        calib = quant.calibrate_trunk(variables, *calib_planes)
        f_arg = quant.make_int8_embed_fn(variables, None, calib=calib)
        f_const = quant.make_int8_embed_fn(variables, None, calib=calib,
                                           const_params=True)
        y, uv = _smooth_planes(rng, 2, 3, 32)
        a = np.asarray(f_arg(y, uv))
        b = np.asarray(f_const(y, uv))
        np.testing.assert_allclose(b, a, atol=1e-6)

    def test_feat_fn_int8_const(self, trunk_setup):
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, calib_planes, rng = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        f = make_feat_fn(model, variables, wire="yuv420", quant="int8_const")
        y, uv = _smooth_planes(rng, 2, 3, 32)
        out = f(y, uv)
        assert out.shape == (2, 512, 3) and np.isfinite(out).all()

    def test_feat_fn_int8_const_rejects_mesh(self, trunk_setup):
        from vqwild_tpu.parallel.mesh import make_mesh
        from vqwild_tpu.retrieval.features import make_feat_fn

        variables, _, _ = trunk_setup
        model = build_model(ModelConfig(method="baseline", nclass=10))
        mesh = make_mesh()
        with pytest.raises(ValueError, match="single-device"):
            make_feat_fn(model, variables, mesh=mesh, wire="yuv420",
                         quant="int8_const")

    def test_cli_flag_maps_to_config(self):
        from vqwild_tpu.apps import cli

        cfg, _ = cli.parse(["--trunk_int8_const", "--wire", "yuv420"])
        assert cfg.eval.trunk_quant == "int8_const"
        cfg2, _ = cli.parse(["--trunk_int8", "--wire", "yuv420"])
        assert cfg2.eval.trunk_quant == "int8"
