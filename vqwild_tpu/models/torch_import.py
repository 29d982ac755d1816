"""PyTorch checkpoint → Flax variable import.

Maps the reference's ``state_dict`` layouts onto ARVModel's variable tree for
output-parity testing and checkpoint reuse (BASELINE.json north star). Two
entry paths:

* ``import_reference_checkpoint`` — a trained reference checkpoint
  (``best.pth.tar`` saved at main.py:596-604, with ``state_dict`` possibly
  ``module.``-prefixed by DataParallel).
* ``inflate_resnet18_2d`` — the ImageNet-2D→F2F-3D inflation (load_2d,
  resnet18_3d_f2f.py:159-188): with temporal kernel size 1 the
  ``unsqueeze(2).expand(...)/t`` collapses to an identity copy of the 2D
  kernels; BN copied verbatim; fc skipped.

Layout conversions (torch → flax NHWC):
  conv3d [O,I,1,kh,kw] → kernel [kh,kw,I,O]
  conv2d [O,I,kh,kw]   → kernel [kh,kw,I,O]
  conv1d [O,I,1] / linear [O,I] → kernel [I,O]
  BN weight/bias/running_mean/running_var → scale/bias + batch_stats mean/var

Upstream's unused ``rank_nl`` block (resnet18_va.py:114-119) is skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _strip_module(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    return {k.replace("module.", "", 1): _to_numpy(v) for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 5:  # [O,I,1,kh,kw] f2f conv3d
        assert w.shape[2] == 1, f"temporal kernel must be 1, got {w.shape}"
        w = w[:, :, 0]
    assert w.ndim == 4
    return np.transpose(w, (2, 3, 1, 0))  # → [kh,kw,I,O]


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 3:  # conv1d [O,I,1]
        assert w.shape[2] == 1
        w = w[:, :, 0]
    assert w.ndim == 2
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _import_bn(sd, prefix: str, params: dict, stats: dict, path: Tuple[str, ...]):
    _set(params, path + ("scale",), sd[prefix + ".weight"])
    _set(params, path + ("bias",), sd[prefix + ".bias"])
    _set(stats, path + ("mean",), sd[prefix + ".running_mean"])
    _set(stats, path + ("var",), sd[prefix + ".running_var"])


def _import_trunk(sd, params: dict, stats: dict, three_d: bool):
    kernel = _conv_kernel  # handles both 4-d and 5-d weights
    _set(params, ("trunk", "conv1", "kernel"), kernel(sd["conv1.weight"]))
    _import_bn(sd, "bn1", params, stats, ("trunk", "bn1"))
    for li in range(1, 5):
        for bi in range(2):
            t_prefix = f"layer{li}.{bi}"
            f_block = ("trunk", f"layer{li}_{bi}")
            for cname in ("conv1", "conv2"):
                _set(
                    params,
                    f_block + (cname, "kernel"),
                    kernel(sd[f"{t_prefix}.{cname}.weight"]),
                )
            for bname in ("bn1", "bn2"):
                _import_bn(sd, f"{t_prefix}.{bname}", params, stats, f_block + (bname,))
            if f"{t_prefix}.downsample.0.weight" in sd:
                _set(
                    params,
                    f_block + ("downsample_conv", "kernel"),
                    kernel(sd[f"{t_prefix}.downsample.0.weight"]),
                )
                _import_bn(
                    sd,
                    f"{t_prefix}.downsample.1",
                    params,
                    stats,
                    f_block + ("downsample_bn",),
                )


def _import_linear(sd, prefix: str, params: dict, path: Tuple[str, ...]):
    _set(params, path + ("kernel",), _dense_kernel(sd[prefix + ".weight"]))
    if prefix + ".bias" in sd:
        _set(params, path + ("bias",), sd[prefix + ".bias"])


def _import_nonlocal(sd, t_prefix: str, params: dict, stats: dict, f_name: str):
    for t_name, f_sub in (("theta", "theta"), ("phi", "phi"), ("g", "g")):
        _import_linear(sd, f"{t_prefix}.{t_name}", params, (f_name, f_sub))
    # W = Sequential(conv1d, bn): nl.py:64-77
    _import_linear(sd, f"{t_prefix}.W.0", params, (f_name, "w"))
    _import_bn(sd, f"{t_prefix}.W.1", params, stats, (f_name, "w_bn"))


def import_state_dict(
    state_dict: Mapping[str, Any], method: str
) -> Dict[str, Any]:
    """torch state_dict → {'params': ..., 'batch_stats': ..., 'memory': ...}.

    ``method`` ∈ {baseline, va, vasa} selects which heads to expect.
    """
    sd = _strip_module(state_dict)
    params: dict = {}
    stats: dict = {}
    out: Dict[str, Any] = {"params": params, "batch_stats": stats}

    _import_trunk(sd, params, stats, three_d=True)
    _import_linear(sd, "fc", params, ("fc",))

    if method in ("va", "vasa"):
        out["memory"] = {"visual_memory": sd["visual_memory"]}
        _import_nonlocal(sd, "cls_nl", params, stats, "cls_nl")
        _import_linear(sd, "nled_fc", params, ("nled_fc",))
    if method == "vasa":
        for t_name, f_sub in (("fc", "fc"), ("fc2", "fc2"), ("fc3", "fc3"), ("fc4", "fc4")):
            _import_linear(sd, f"word_adaptor.{t_name}", params, ("word_adaptor", f_sub))
    return out


def import_reference_checkpoint(path: str, method: str) -> Dict[str, Any]:
    """Load a reference ``best.pth.tar`` and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return import_state_dict(sd, method)


def inflate_resnet18_2d(state_dict_2d: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision resnet18 (2D) → trunk params/stats, fc skipped
    (the load_2d inflation path; temporal size 1 makes it an identity copy)."""
    sd = _strip_module(state_dict_2d)
    params: dict = {}
    stats: dict = {}
    _import_trunk(sd, params, stats, three_d=False)
    return {"params": params, "batch_stats": stats}


def merge_variables(init_vars: Mapping[str, Any], imported: Mapping[str, Any]):
    """Overlay imported arrays onto freshly-initialized variables, validating
    shapes; leaves missing entries (e.g. fc after 2D inflation) at init."""
    import jax

    def overlay(base, over):
        if isinstance(over, Mapping):
            out = dict(base)
            for k, v in over.items():
                if k not in base:
                    raise KeyError(f"imported key {k!r} not in model tree")
                out[k] = overlay(base[k], v)
            return out
        base_arr = np.asarray(base)
        arr = np.asarray(over).astype(base_arr.dtype)
        if arr.shape != base_arr.shape:
            raise ValueError(f"shape mismatch: {arr.shape} vs {base_arr.shape}")
        return jax.numpy.asarray(arr)

    unknown = set(imported) - set(init_vars)
    if unknown:
        raise KeyError(f"imported collections not in model: {sorted(unknown)}")
    return {
        coll: overlay(base, imported[coll]) if coll in imported else base
        for coll, base in init_vars.items()
    }
