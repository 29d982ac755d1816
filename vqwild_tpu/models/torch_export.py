"""Flax variables → PyTorch checkpoint export (inverse of torch_import).

Completes checkpoint interop: a model trained in this framework can be
handed back to the reference codebase as a ``best.pth.tar`` that its
``--evaluate --test_load`` path restores with ``strict=True``
(main.py:546-553). Layout conversions are the exact inverses of
torch_import.py:

  kernel [kh,kw,I,O] → conv3d weight [O,I,1,kh,kw]   (f2f temporal size 1)
  kernel [I,O]       → linear weight [O,I] / conv1d [O,I,1] (nl blocks)
  scale/bias + batch_stats mean/var → BN weight/bias/running_mean/var
                                      (+ num_batches_tracked=0, required
                                       by strict torch loads)

The reference's dead ``rank_nl`` block (resnet18_va.py:114-119 — created
but never called in forward) has no counterpart here; its keys are filled
with the exported ``cls_nl`` values so strict restores succeed. The
``optimizer`` slot is an empty dict: the reference only reads it when
resuming training, which it does not support from --test_load.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _conv3d_weight(kernel) -> np.ndarray:
    k = _np(kernel)  # [kh, kw, I, O]
    assert k.ndim == 4, k.shape
    return np.transpose(k, (3, 2, 0, 1))[:, :, None]  # [O, I, 1, kh, kw]


def _linear_weight(kernel) -> np.ndarray:
    k = _np(kernel)  # [I, O]
    assert k.ndim == 2, k.shape
    return np.transpose(k, (1, 0))


def _conv1d_weight(kernel) -> np.ndarray:
    return _linear_weight(kernel)[:, :, None]  # [O, I, 1]


def _export_bn(sd, prefix: str, p: Mapping, s: Mapping) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])
    sd[prefix + ".running_mean"] = _np(s["mean"])
    sd[prefix + ".running_var"] = _np(s["var"])
    sd[prefix + ".num_batches_tracked"] = np.zeros((), np.int64)


def _export_linear(sd, prefix: str, p: Mapping, conv1d: bool = False) -> None:
    sd[prefix + ".weight"] = (_conv1d_weight if conv1d else _linear_weight)(
        p["kernel"]
    )
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _export_nonlocal(sd, t_prefix: str, p: Mapping, s: Mapping) -> None:
    for name in ("theta", "phi", "g"):
        _export_linear(sd, f"{t_prefix}.{name}", p[name], conv1d=True)
    _export_linear(sd, f"{t_prefix}.W.0", p["w"], conv1d=True)
    _export_bn(sd, f"{t_prefix}.W.1", p["w_bn"], s["w_bn"])


def export_state_dict(variables: Mapping[str, Any], method: str,
                      module_prefix: bool = True) -> Dict[str, np.ndarray]:
    """{'params', 'batch_stats'[, 'memory']} → reference-layout state_dict
    (numpy values; wrap with save_reference_checkpoint for a .pth.tar).

    ``module_prefix`` (default on) prefixes every key with ``module.`` —
    the layout the reference actually saves and strict-loads: main.py:551
    restores into the MyDataParallel-wrapped model (set_distributed_backend,
    model_utils.py:134-149), whose state_dict keys are all ``module.*``.
    Pass False for a bare-``ResNet3D`` state_dict."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    tp, ts = params["trunk"], stats["trunk"]
    sd["conv1.weight"] = _conv3d_weight(tp["conv1"]["kernel"])
    _export_bn(sd, "bn1", tp["bn1"], ts["bn1"])
    for li in range(1, 5):
        for bi in range(2):
            fp, fs = tp[f"layer{li}_{bi}"], ts[f"layer{li}_{bi}"]
            t_prefix = f"layer{li}.{bi}"
            for cname in ("conv1", "conv2"):
                sd[f"{t_prefix}.{cname}.weight"] = _conv3d_weight(fp[cname]["kernel"])
            for bname in ("bn1", "bn2"):
                _export_bn(sd, f"{t_prefix}.{bname}", fp[bname], fs[bname])
            if "downsample_conv" in fp:
                sd[f"{t_prefix}.downsample.0.weight"] = _conv3d_weight(
                    fp["downsample_conv"]["kernel"]
                )
                _export_bn(sd, f"{t_prefix}.downsample.1", fp["downsample_bn"],
                           fs["downsample_bn"])

    _export_linear(sd, "fc", params["fc"])

    if method in ("va", "vasa"):
        sd["visual_memory"] = _np(variables["memory"]["visual_memory"])
        _export_nonlocal(sd, "cls_nl", params["cls_nl"], stats["cls_nl"])
        _export_linear(sd, "nled_fc", params["nled_fc"])
        # dead rank_nl block: fill with cls_nl so strict=True restores work
        for k in [k for k in sd if k.startswith("cls_nl.")]:
            sd["rank_nl." + k[len("cls_nl."):]] = sd[k]
    if method == "vasa":
        for sub in ("fc", "fc2", "fc3", "fc4"):
            _export_linear(sd, f"word_adaptor.{sub}", params["word_adaptor"][sub])
    if module_prefix:
        sd = {"module." + k: v for k, v in sd.items()}
    return sd


def save_reference_checkpoint(path: str, variables: Mapping[str, Any],
                              method: str, epoch: int = 0,
                              score: float = 0.0) -> None:
    """Write a reference-compatible ``best.pth.tar`` (requires torch)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(variables, method).items()}
    torch.save(
        {"epoch": epoch, "state_dict": sd, "score": score, "optimizer": {}},
        path,
    )
