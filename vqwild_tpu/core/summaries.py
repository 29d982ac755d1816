"""Model/optimizer introspection tables (reference misc_utils/utils_torch.py).

``model_summary`` tabulates parameter shapes + totals (utils_torch.py:22-46);
``optimizer_summary`` reports the optax chain's hyperparameters
(utils_torch.py:49-91 equivalent). Both log through the structured logger.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from vqwild_tpu.core.logging import get_logger

log = get_logger("summaries")


def _flatten(tree, prefix=""):
    out = []
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in sorted(tree.items()):
            out.extend(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out.append((prefix, tree))
    return out


def model_summary(params: Any, state: Any = None) -> int:
    """Log a parameter table; returns total parameter count."""
    rows = _flatten(params)
    total = 0
    log.info("%-64s %-20s %s", "parameter", "shape", "count")
    for name, arr in rows:
        n = int(np.prod(np.shape(arr))) if np.ndim(arr) else 1
        total += n
        log.info("%-64s %-20s %d", name, str(tuple(np.shape(arr))), n)
    log.info("total parameters: %.3fM (%d)", total / 1e6, total)
    if state:
        srows = _flatten(dict(state))
        stotal = sum(int(np.prod(np.shape(a))) for _, a in srows)
        log.info("state entries: %d arrays, %.3fM values", len(srows), stotal / 1e6)
    return total


def optimizer_summary(
    init_lr: float, weight_decay: float, lr_decay_epoch: int, accum_grad: int = 1
):
    log.info(
        "optimizer: Adam lr=%g (x0.1 @ epoch %d) weight_decay=%g accum_grad=%d",
        init_lr,
        lr_decay_epoch,
        weight_decay,
        accum_grad,
    )
