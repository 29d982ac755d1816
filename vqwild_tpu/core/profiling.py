"""Profiling hooks — the TPU upgrade of the reference's wall-clock meters
(SURVEY §5: utils.py Timer/AverageMeter were its only tracing).

``trace(run_dir)`` wraps a region in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``StepTimer`` gives per-step host-side timing with
device-sync points for honest step latencies on asynchronous backends (the
axon relay does not block in block_until_ready — sync via tiny readbacks).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np

from vqwild_tpu.core.logging import get_logger

log = get_logger("profiling")


@contextlib.contextmanager
def phase(timings: dict, key: str):
    """Accumulate wall time into ``timings[key]`` — per-phase cost
    accounting for the production-scale eval benchmarks
    (benchmarks/eval_scale.py reads evaluator ``.timings``)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timings[key] = timings.get(key, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(run_dir: str, enabled: bool = True):
    """jax.profiler trace context; writes to {run_dir}/profile."""
    if not enabled:
        yield
        return
    out = os.path.join(run_dir, "profile")
    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", out)


def sync(tree) -> None:
    """Force completion by reading back one element of each leaf (works on
    backends where block_until_ready returns early)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf.addressable_shards[0].data.ravel()[:1]))
        else:
            np.asarray(leaf).ravel()[:1]


class StepTimer:
    """Rolling per-step timings: data / compute / total, logged every N."""

    def __init__(self, window: int = 50):
        self.window = window
        self.samples = []
        self._t_last = time.time()

    def step(self, data_time: float, result_tree=None) -> float:
        if result_tree is not None:
            sync(result_tree)
        now = time.time()
        total = now - self._t_last
        self._t_last = now
        self.samples.append((data_time, total))
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return total

    @property
    def avg_total(self) -> float:
        return float(np.mean([t for _, t in self.samples])) if self.samples else 0.0

    @property
    def avg_data(self) -> float:
        return float(np.mean([d for d, _ in self.samples])) if self.samples else 0.0
