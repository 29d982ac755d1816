"""Checkpoint export (models/torch_export.py): round-trip + strict restore
into the actual reference PyTorch models."""

import os

import jax
import numpy as np
import pytest

from vqwild_tpu.models import torch_export, torch_import
from vqwild_tpu.models.arv import ARVModel, init_model

REFERENCE_ROOT = "/root/reference"


def _vars(method, nclass=200, sem=200):
    model = ARVModel(method=method, nclass=nclass, semantic_dim=sem)
    params, state = init_model(model, jax.random.PRNGKey(0), (1, 1, 32, 32, 3))
    return model, {"params": params, **state}


class TestRoundTrip:
    @pytest.mark.parametrize("method", ["baseline", "va", "vasa"])
    def test_import_of_export_is_identity(self, method):
        _, variables = _vars(method)
        sd = torch_export.export_state_dict(variables, method)
        back = torch_import.import_state_dict(sd, method)
        merged = torch_import.merge_variables(variables, back)
        for orig, rt in zip(
            jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(merged)
        ):
            np.testing.assert_allclose(np.asarray(orig), np.asarray(rt), atol=1e-6)


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not mounted"
)
class TestReferenceRestore:
    def _load_reference_model(self, fname):
        import importlib.util
        import sys

        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        spec = importlib.util.spec_from_file_location(
            "refx_" + fname, os.path.join(REFERENCE_ROOT, "models", fname + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _build(self, mod, method):
        import torch

        class _CpuTensorStub:
            def __init__(self, t):
                self._t = t

            def cuda(self):
                return self._t

        class Args:
            semantic_mem = _CpuTensorStub(torch.zeros(200, 200))
            semantic_json = "wordembed_glove_d200.json"

        torch.manual_seed(0)
        return mod.ResNet3D(Args(), mod.BasicBlock, [2, 2, 2, 2], num_classes=200)

    @pytest.mark.parametrize(
        "method,fname",
        [
            ("baseline", "resnet18_3d_f2f"),
            ("va", "resnet18_va"),
            ("vasa", "resnet18_vasa"),
        ],
    )
    def test_strict_restore_and_output_parity(self, method, fname):
        """The interop contract: the reference's --test_load path is a
        strict=True load_state_dict (main.py:546-553); our export must
        restore cleanly AND produce the same eval outputs."""
        import torch

        mod = self._load_reference_model(fname)
        # main.py:551 restores into the DataParallel-wrapped model, whose
        # strict=True keys are all 'module.*' — load through the same wrapper.
        tmodel = torch.nn.DataParallel(self._build(mod, method))

        model, variables = _vars(method)
        sd_np = torch_export.export_state_dict(variables, method)
        assert all(k.startswith("module.") for k in sd_np)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
        tmodel.load_state_dict(sd, strict=True)  # raises on any key/shape drift
        tmodel.eval()

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            if method == "baseline":
                ref_out = tmodel(torch.from_numpy(x)).numpy()
            else:
                ref_out = tmodel(
                    torch.from_numpy(x), target=None, temperature=0.1
                ).numpy()
        out = model.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out.rank_embed), ref_out, atol=2e-4, rtol=1e-3
        )

    def test_save_reference_checkpoint_loads_like_upstream(self, tmp_path):
        """torch.load(...)["state_dict"] — the exact access pattern of the
        reference's --evaluate path."""
        import torch

        _, variables = _vars("va")
        path = str(tmp_path / "best.pth.tar")
        torch_export.save_reference_checkpoint(path, variables, "va",
                                               epoch=3, score=0.42)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt["epoch"] == 3 and ckpt["score"] == 0.42
        mod = self._load_reference_model("resnet18_va")
        tmodel = torch.nn.DataParallel(self._build(mod, "va"))
        tmodel.load_state_dict(ckpt["state_dict"], strict=True)
        # and back through our own importer
        back = torch_import.import_reference_checkpoint(path, "va")
        merged = torch_import.merge_variables(variables, back)
        for orig, rt in zip(
            jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(merged)
        ):
            np.testing.assert_allclose(np.asarray(orig), np.asarray(rt), atol=1e-6)
