import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqwild_tpu.models import heads
from vqwild_tpu.models.arv import ARVModel, init_model

REFERENCE_ROOT = "/root/reference"


def small_model(method, nclass=10, semantic_dim=16):
    return ARVModel(method=method, nclass=nclass, semantic_dim=semantic_dim)


class TestHeads:
    def test_l2_normalize(self):
        x = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
        out = heads.l2_normalize(jnp.asarray(x))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)
        # zero vector stays finite (torch F.normalize semantics)
        z = heads.l2_normalize(jnp.zeros((1, 8)))
        assert np.all(np.isfinite(z))

    def test_pairwise_l2_matches_naive(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(5, 16)).astype(np.float32)
        b = rng.normal(size=(7, 16)).astype(np.float32)
        d = np.asarray(heads.pairwise_l2(jnp.asarray(a), jnp.asarray(b)))
        naive = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        np.testing.assert_allclose(d, naive, atol=1e-5)

    def test_ema_memory_sequential_semantics(self):
        """Repeated labels in one batch must compound sequentially, exactly as
        the upstream Python loop (resnet18_va.py:186-192)."""
        rng = np.random.default_rng(2)
        mem = rng.normal(size=(4, 8)).astype(np.float32)
        emb = rng.normal(size=(5, 8)).astype(np.float32)
        targets = np.array([1, 3, 1, 1, 0], dtype=np.int32)
        mv = 0.9
        expected = mem.copy()
        for i, y in enumerate(targets):
            upd = mv * expected[y] + (1 - mv) * emb[i]
            expected[y] = upd / max(np.linalg.norm(upd), 1e-12)
        got = np.asarray(
            heads.ema_memory_update(
                jnp.asarray(mem), jnp.asarray(emb), jnp.asarray(targets), mv
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_param_free_layernorm_torch_std(self):
        x = np.random.default_rng(3).normal(size=(4, 16)).astype(np.float32)
        got = np.asarray(heads.param_free_layernorm(jnp.asarray(x)))
        mean = x.mean(-1, keepdims=True)
        std = x.std(-1, ddof=1, keepdims=True)  # torch .std is unbiased
        np.testing.assert_allclose(got, (x - mean) / (std + 1e-6), atol=1e-5)

    def test_memory_distance_logits(self):
        rng = np.random.default_rng(4)
        e = rng.normal(size=(3, 8)).astype(np.float32)
        m = rng.normal(size=(5, 8)).astype(np.float32)
        logits = np.asarray(heads.memory_distance_logits(jnp.asarray(e), jnp.asarray(m), 0.1))
        naive = -np.linalg.norm(e[:, None] - m[None], axis=-1) / 0.1
        np.testing.assert_allclose(logits, naive, atol=1e-4)


class TestARVModel:
    @pytest.mark.parametrize("method", ["baseline", "va", "vasa"])
    def test_shapes_and_state(self, method):
        model = small_model(method)
        params, state = init_model(model, jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
        t = jnp.array([1, 2], jnp.int32)
        sem = jnp.asarray(np.random.default_rng(1).normal(size=(10, 16)), jnp.float32)
        out, mutated = model.apply(
            {"params": params, **state},
            x,
            targets=t,
            semantic_memory=sem if method == "vasa" else None,
            train=True,
            mutable=["batch_stats", "memory"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert out.frame_embed.shape == (2, 4, 512)
        assert out.clip_embed.shape == (2, 512)
        assert out.logits.shape == (2, 10)
        if method in ("va", "vasa"):
            assert out.reg_logits.shape == (2, 10)
            assert out.nled_logits.shape == (2, 10)
            assert "memory" in mutated
            mem = mutated["memory"]["visual_memory"]
            # rows 1,2 were EMA-updated from zero-init → unit norm
            norms = np.linalg.norm(np.asarray(mem), axis=-1)
            assert norms[1] > 0.99 and norms[2] > 0.99 and norms[0] == 0
        if method == "vasa":
            assert out.word_logits.shape == (2, 10)

    def test_eval_mode_returns_embeddings_only(self):
        model = small_model("va")
        params, state = init_model(model, jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
        x = jnp.ones((2, 4, 32, 32, 3))
        out = model.apply({"params": params, **state}, x, train=False)
        assert out.logits is None and out.reg_logits is None
        assert out.rank_embed.shape == (2, 512, 4)

    def test_temporal_fold_equivalence(self):
        """Per-frame features must be independent of other frames (temporal
        receptive field is exactly 1 — the f2f property)."""
        model = small_model("baseline")
        params, state = init_model(model, jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
        rng = np.random.default_rng(5)
        f0 = rng.normal(size=(1, 1, 32, 32, 3)).astype(np.float32)
        f1 = rng.normal(size=(1, 1, 32, 32, 3)).astype(np.float32)
        both = np.concatenate([f0, f1], axis=1)
        out_both = model.apply({"params": params, **state}, jnp.asarray(both), train=False)
        out_f0 = model.apply({"params": params, **state}, jnp.asarray(f0), train=False)
        np.testing.assert_allclose(
            np.asarray(out_both.frame_embed[:, 0]),
            np.asarray(out_f0.frame_embed[:, 0]),
            atol=1e-5,
        )

    def test_stem_s2d_lowering_parity(self):
        """stem_s2d=True is the same math on the same [7,7,3,64] parameter:
        identical param tree, matching fwd (train+eval), batch stats, and
        grads — only the conv lowering differs (resnet_f2f._Stem7x7S2D)."""
        m0 = ARVModel(method="baseline", nclass=10, stem_s2d=False)
        m1 = ARVModel(method="baseline", nclass=10, stem_s2d=True)
        params, state = init_model(m0, jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 3, 32, 32, 3)), jnp.float32)
        t = jnp.array([1, 2], jnp.int32)

        e0 = m0.apply({"params": params, **state}, x, train=False)
        e1 = m1.apply({"params": params, **state}, x, train=False)
        np.testing.assert_allclose(
            np.asarray(e0.frame_embed), np.asarray(e1.frame_embed), atol=1e-4
        )

        def loss(model):
            def f(p):
                out, muts = model.apply(
                    {"params": p, **state}, x, targets=t, train=True,
                    mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)},
                )
                return jnp.mean(out.logits**2), muts
            return f

        (l0, mut0), g0 = jax.value_and_grad(loss(m0), has_aux=True)(params)
        (l1, mut1), g1 = jax.value_and_grad(loss(m1), has_aux=True)(params)
        assert jax.tree_util.tree_structure(g0) == jax.tree_util.tree_structure(g1)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(mut0["batch_stats"]),
            jax.tree_util.tree_leaves(mut1["batch_stats"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            # The isolated stem's grads match to ~4e-7 relative; end-to-end,
            # fp32 reassociation at the fwd-parity level (~1e-4) is amplified
            # by the BN-train chain's conditioning — a measured 1e-4 *input*
            # perturbation moves same-lowering grads by ~5% in the worst
            # leaf. Compare in norm against that envelope, not element-wise.
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert rel < 3e-2, rel

    def test_stem_s2d_odd_input_falls_back(self):
        """Odd spatial dims can't space-to-depth; the conv7 path must engage
        with the same parameter tree."""
        m1 = ARVModel(method="baseline", nclass=10, stem_s2d=True)
        params, state = init_model(m1, jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 2, 31, 33, 3)), jnp.float32
        )
        out = m1.apply({"params": params, **state}, x, train=False)
        assert out.frame_embed.shape == (1, 2, 512)

    def test_gradients_flow(self):
        model = small_model("va")
        params, state = init_model(model, jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 32, 32, 3)), jnp.float32)
        t = jnp.array([1, 2], jnp.int32)

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **state},
                x,
                targets=t,
                train=True,
                mutable=["batch_stats", "memory"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            import optax

            return (
                optax.softmax_cross_entropy_with_integer_labels(out.nled_logits, t).mean()
                + optax.softmax_cross_entropy_with_integer_labels(out.reg_logits, t).mean()
            )

        grads = jax.grad(loss_fn)(params)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0
        )
        assert gnorm > 0


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not mounted"
)
class TestTorchParity:
    """Output parity vs the actual reference PyTorch models (random weights
    imported through torch_import). Eval mode only: the reference's train
    paths hard-code .cuda() (resnet18_va.py:172-199)."""

    def _load_reference_model(self, fname):
        import importlib.util
        import sys

        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        spec = importlib.util.spec_from_file_location(
            "ref_" + fname, os.path.join(REFERENCE_ROOT, "models", fname + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @pytest.mark.parametrize(
        "method,fname",
        [
            ("baseline", "resnet18_3d_f2f"),
            ("va", "resnet18_va"),
            ("vasa", "resnet18_vasa"),
        ],
    )
    def test_eval_forward_parity(self, method, fname):
        import torch

        from vqwild_tpu.models import torch_import

        mod = self._load_reference_model(fname)

        class _CpuTensorStub:
            """vasa's __init__ calls args.semantic_mem.cuda() (resnet18_vasa.py:140);
            give it a .cuda() that stays on CPU."""

            def __init__(self, t):
                self._t = t

            def cuda(self):
                return self._t

        class Args:
            semantic_mem = _CpuTensorStub(torch.zeros(200, 200))
            semantic_json = "wordembed_glove_d200.json"

        torch.manual_seed(0)
        tmodel = mod.ResNet3D(Args(), mod.BasicBlock, [2, 2, 2, 2], num_classes=200)
        tmodel.eval()
        # randomize BN running stats so stats import is actually exercised
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.7, 1.3)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 5, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            if method == "baseline":
                ref_out = tmodel(torch.from_numpy(x)).numpy()  # [B, 512, T]
            else:  # va/vasa eval forwards still take target/temperature args
                ref_out = tmodel(
                    torch.from_numpy(x), target=None, temperature=0.1
                ).numpy()

        model = ARVModel(method=method, nclass=200, semantic_dim=200)
        params, state = init_model(model, jax.random.PRNGKey(0), (1, 1, 64, 64, 3))
        imported = torch_import.import_state_dict(tmodel.state_dict(), method)
        variables = torch_import.merge_variables({"params": params, **state}, imported)
        out = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(out.rank_embed), ref_out, atol=2e-4, rtol=1e-3
        )


class TestInflation2D:
    def test_inflate_from_2d_state_dict(self):
        """load_2d equivalence: a 2D resnet18 state_dict inflates into the
        trunk (temporal size 1 → identity copy), fc left at init."""
        import torch
        import torch.nn as tnn

        from vqwild_tpu.models import torch_import
        from vqwild_tpu.models.arv import ARVModel, init_model

        # build a shape-faithful 2D resnet18 state dict (torchvision naming,
        # torchvision itself is not installed here)
        import numpy as _np

        rng = _np.random.default_rng(0)

        def t(*shape):
            return torch.tensor(rng.normal(size=shape).astype(_np.float32))

        sd = {"conv1.weight": t(64, 3, 7, 7)}
        for bn in ["bn1"]:
            sd |= {f"{bn}.weight": t(64), f"{bn}.bias": t(64),
                   f"{bn}.running_mean": t(64), f"{bn}.running_var": abs(t(64)) + 0.5}
        inplanes = 64
        for li, planes in enumerate([64, 128, 256, 512], start=1):
            for bi in range(2):
                stride_block = li > 1 and bi == 0
                pre = f"layer{li}.{bi}"
                sd[f"{pre}.conv1.weight"] = t(planes, inplanes if bi == 0 else planes, 3, 3)
                sd[f"{pre}.conv2.weight"] = t(planes, planes, 3, 3)
                for bn in ["bn1", "bn2"]:
                    sd |= {f"{pre}.{bn}.weight": t(planes), f"{pre}.{bn}.bias": t(planes),
                           f"{pre}.{bn}.running_mean": t(planes),
                           f"{pre}.{bn}.running_var": abs(t(planes)) + 0.5}
                if stride_block:
                    sd[f"{pre}.downsample.0.weight"] = t(planes, inplanes, 1, 1)
                    sd |= {f"{pre}.downsample.1.weight": t(planes),
                           f"{pre}.downsample.1.bias": t(planes),
                           f"{pre}.downsample.1.running_mean": t(planes),
                           f"{pre}.downsample.1.running_var": abs(t(planes)) + 0.5}
            inplanes = planes
        sd["fc.weight"] = t(1000, 512)
        sd["fc.bias"] = t(1000)

        import jax

        model = ARVModel(method="baseline", nclass=200)
        params, state = init_model(model, jax.random.PRNGKey(0), (1, 1, 64, 64, 3))
        imported = torch_import.inflate_resnet18_2d(sd)
        merged = torch_import.merge_variables({"params": params, **state}, imported)
        # trunk conv weights replaced, fc untouched (inflation skips fc)
        got = _np.asarray(merged["params"]["trunk"]["conv1"]["kernel"])
        want = _np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
        _np.testing.assert_allclose(got, want, atol=0)
        _np.testing.assert_allclose(
            _np.asarray(merged["params"]["fc"]["kernel"]),
            _np.asarray(params["fc"]["kernel"]),
            atol=0,
        )
        # bn stats imported
        _np.testing.assert_allclose(
            _np.asarray(merged["batch_stats"]["trunk"]["bn1"]["mean"]),
            sd["bn1.running_mean"].numpy(),
            atol=0,
        )


class TestNonLocalND:
    """NONLocalBlock2D/3D parity wrappers (nl.py:161-184)."""

    def _run(self, x, sub_sample=False):
        from vqwild_tpu.models.heads import NonLocalND

        m = NonLocalND(channels=x.shape[-1], inter_channels=8, sub_sample=sub_sample)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v, m.apply(v, x, train=False)

    def test_2d_identity_at_init(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 6, 6, 16)).astype(np.float32)
        _, _, y = self._run(x)
        # zero-init BN on W makes the block start as identity
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)

    def test_3d_shapes_and_subsample(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 4, 4, 16)).astype(np.float32)
        m, v, y = self._run(x, sub_sample=True)
        assert y.shape == x.shape
        # train mode perturbs via batch-stat BN; still finite
        y2, _ = m.apply(
            v, x, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert np.isfinite(np.asarray(y2)).all()
