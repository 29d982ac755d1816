"""The training driver loop (reference main.py:533-620).

Epoch loop with periodic trimmed-retrieval validation, best-checkpoint
tracking on the 2-order harmonic mAP, and step-level loss/throughput logging.
The loop is deliberately thin: data comes from a PrefetchLoader, compute from
make_train_step, evaluation from a caller-supplied callback — so tests can
drive it end-to-end on synthetic data.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import numpy as np

from vqwild_tpu.core.logging import get_logger
from vqwild_tpu.core.meters import AverageMeter, Timer
from vqwild_tpu.parallel.mesh import (
    pad_to_multiple,
    scan_batch_sharding,
    shard_batch_arrays,
)
from vqwild_tpu.train.checkpoint import CheckpointManager
from vqwild_tpu.train.step import TrainState

log = get_logger("train.loop")


@dataclasses.dataclass
class LoopResult:
    state: TrainState
    best_score: float
    best_epoch: int
    history: list


class NonFiniteLossError(RuntimeError):
    """Training diverged: a loss became NaN/Inf (train failure detection).

    The reference has no failure detection (SURVEY §5) — a NaN quietly burns
    the remaining epochs and poisons the checkpoints. Here the loop halts at
    the next loss sync; the previous epoch's ``last`` checkpoint (saved
    before the divergence finished an epoch) is the resume point.
    """


class TrainLoop:
    def __init__(
        self,
        step_fn: Callable,
        loader,
        epochs: int,
        eval_fn: Optional[Callable] = None,  # (state, epoch) -> score dict
        eval_per_epoch: int = 2,
        ckpt: Optional[CheckpointManager] = None,
        mesh=None,
        print_freq: int = 100,
        max_steps_per_epoch: Optional[int] = None,
        start_epoch: int = 0,
        scan_fn: Optional[Callable] = None,
        scan_steps: int = 1,
        nonfinite_policy: str = "halt",
    ):
        """``scan_fn`` + ``scan_steps`` > 1 enables the dispatch-amortized
        inner loop (train/step.py:make_scanned_train_step): groups of
        ``scan_steps`` batches are stacked on the host and run as ONE device
        dispatch (lax.scan), so the ~350-buffer TrainState never round-trips
        between dependent steps. Leftover batches (< scan_steps at epoch end)
        fall back to ``step_fn`` — zero-weight padding would still advance
        the optimizer (weight decay, bias correction), so it is never used
        to fill a scan window.

        ``nonfinite_policy``: what to do when a synced loss is NaN/Inf —
        "halt" (default) raises NonFiniteLossError at the next loss sync
        (losses sync every print_freq steps, so detection lags at most that
        many steps — by design, a per-step readback would serialize the
        async dispatch queue); "warn" logs and keeps going."""
        if nonfinite_policy not in ("halt", "warn"):
            raise ValueError(f"unknown nonfinite_policy {nonfinite_policy!r}")
        self.step_fn = step_fn
        self.loader = loader
        self.epochs = epochs
        self.eval_fn = eval_fn
        self.eval_per_epoch = eval_per_epoch
        self.ckpt = ckpt
        self.mesh = mesh
        self.print_freq = print_freq
        self.max_steps = max_steps_per_epoch
        self.start_epoch = start_epoch
        self.scan_fn = scan_fn
        self.scan_steps = scan_steps if scan_fn is not None else 1
        self.nonfinite_policy = nonfinite_policy

    def _put(self, batch):
        """→ (wire arrays..., labels, weights-or-None), mesh-sharded.

        Under a mesh, rows pad (edge-repeat) to the data-axis multiple —
        3·batch_size rarely divides the chip count (the reference default
        batch of 10 triplets = 30 rows on 8 chips) — and a 0/1 weight row
        vector masks the padding out of losses and memory updates."""
        arrays = batch.arrays + (batch.labels,)
        if self.mesh is None:
            return arrays + (None,)
        shards = self.mesh.shape["data"]
        n = batch.labels.shape[0]
        if n % shards:
            padded = []
            for a in arrays:
                p, _ = pad_to_multiple(a, shards)
                padded.append(p)
            arrays = tuple(padded)
            weights = np.zeros(arrays[-1].shape[0], np.float32)
            weights[:n] = 1.0
        else:
            weights = np.ones(n, np.float32)
        return shard_batch_arrays(self.mesh, *arrays, weights)

    def _put_group(self, group):
        """Stack ``len(group)`` loader batches along a leading scan axis →
        (arrays [K,B,...], labels [K,B], weights [K,B]-or-None); under a mesh
        rows pad + shard on the *second* axis (P(None, 'data'))."""
        stacked = [
            np.stack([b.arrays[j] for b in group])
            for j in range(len(group[0].arrays))
        ]
        labels = np.stack([b.labels for b in group])
        arrays = tuple(stacked) + (labels,)
        if self.mesh is None:
            return arrays + (None,)
        shards = self.mesh.shape["data"]
        n = labels.shape[1]
        if n % shards:
            arrays = tuple(pad_to_multiple(a, shards, axis=1)[0] for a in arrays)
            weights = np.zeros(arrays[-1].shape[:2], np.float32)
            weights[:, :n] = 1.0
        else:
            weights = np.ones(labels.shape[:2], np.float32)
        sharding = scan_batch_sharding(self.mesh)
        return tuple(
            jax.device_put(a, sharding) for a in arrays + (weights,)
        )

    def run(self, state: TrainState) -> LoopResult:
        best_score, best_epoch = -1.0, -1
        history = []
        for epoch in range(self.start_epoch, self.epochs):
            timer = Timer()
            data_time = AverageMeter()
            loss_meters: Dict[str, AverageMeter] = {}
            nsteps = 0

            def capped():
                for i, b in enumerate(self.loader.epoch(epoch)):
                    if self.max_steps is not None and i >= self.max_steps:
                        return
                    yield b

            def drain(pending):
                bad = None
                for entry in pending:
                    for k, v in entry.items():
                        for x in np.asarray(v).ravel():
                            if not np.isfinite(x) and bad is None:
                                bad = (k, float(x))
                            loss_meters.setdefault(k, AverageMeter()).update(float(x))
                pending.clear()
                if bad is not None:
                    msg = (
                        f"non-finite loss {bad[0]}={bad[1]} detected by epoch "
                        f"{epoch} step {nsteps} (sync granularity "
                        f"print_freq={self.print_freq}); resume from the "
                        f"'last' checkpoint of the previous epoch"
                    )
                    if self.nonfinite_policy == "halt":
                        log.error(msg)
                        raise NonFiniteLossError(msg)
                    log.warning(msg)

            pending = []  # device-scalar losses; synced only at print time so
            # per-step readback never serializes the async dispatch queue

            def progress_log(step_idx):
                drain(pending)
                log.info(
                    "[%d][%d] %s dataload=%.3fs best=%.3f",
                    epoch,
                    step_idx,
                    " ".join(
                        f"{k}={m.avg:.4f}" for k, m in sorted(loss_meters.items())
                    ),
                    data_time.avg,
                    best_score,
                )

            next_print = self.print_freq
            if self.scan_steps > 1:
                # dispatch-amortized path: scan_steps batches per XLA call
                import itertools

                it = iter(capped())
                while True:
                    group = list(itertools.islice(it, self.scan_steps))
                    if not group:
                        break
                    data_time.update(timer.tick())
                    if len(group) == self.scan_steps:
                        *arrs, weights = self._put_group(group)
                        if weights is None:
                            state, losses = self.scan_fn(state, *arrs)
                        else:
                            state, losses = self.scan_fn(state, *arrs, weights=weights)
                        nsteps += len(group)
                        pending.append(losses)
                    else:  # epoch tail < scan window → per-step fn
                        for b in group:
                            *arrs, weights = self._put(b)
                            if weights is None:
                                state, losses = self.step_fn(state, *arrs)
                            else:
                                state, losses = self.step_fn(state, *arrs, weights=weights)
                            nsteps += 1
                            pending.append(losses)
                    timer.tick()
                    if nsteps >= next_print:
                        next_print += self.print_freq
                        progress_log(nsteps)
            else:
                # one-batch lookahead: ship batch k+1 to device while step k
                # runs (jax dispatch is async, so _put overlaps the compute)
                def batches():
                    it = iter(capped())
                    nxt = next(it, None)
                    while nxt is not None:
                        cur = self._put(nxt)
                        nxt = next(it, None)
                        yield cur

                for i, arrays in enumerate(batches()):
                    data_time.update(timer.tick())
                    *arrs, weights = arrays
                    if weights is None:
                        state, losses = self.step_fn(state, *arrs)
                    else:
                        state, losses = self.step_fn(state, *arrs, weights=weights)
                    nsteps += 1
                    pending.append(losses)
                    timer.tick()
                    if i % self.print_freq == 0 and i > 0:
                        progress_log(i)
            drain(pending)
            log.info(
                "epoch %d done: %d steps, %s",
                epoch,
                nsteps,
                " ".join(f"{k}={m.avg:.4f}" for k, m in sorted(loss_meters.items())),
            )
            entry = dict(
                epoch=epoch,
                steps=nsteps,
                losses={k: m.avg for k, m in sorted(loss_meters.items())},
            )
            history.append(entry)

            if self.ckpt is not None:
                # full training state -> mid-training resume (reference has
                # none, SURVEY §5 - save-best-only upstream)
                self.ckpt.save(
                    "last",
                    dict(
                        params=state.params,
                        batch_stats=state.batch_stats,
                        memory=state.memory,
                        opt_state=state.opt_state,
                        step=state.step,
                        dropout_rng=state.dropout_rng,
                        epoch=epoch,
                    ),
                )

            is_eval_epoch = (
                self.eval_fn is not None and (epoch + 1) % self.eval_per_epoch == 0
            )
            if is_eval_epoch:
                score = self.eval_fn(state, epoch)
                ap = float(score.get("ap", 0.0))
                entry["ap"] = ap
                log.warning("epoch %d validation ap=%.4f (best %.4f)", epoch, ap, best_score)
                if ap > best_score:
                    best_score, best_epoch = ap, epoch
                    if self.ckpt is not None:
                        self.ckpt.save(
                            "best",
                            dict(
                                params=state.params,
                                batch_stats=state.batch_stats,
                                memory=state.memory,
                                epoch=epoch,
                                score=ap,
                            ),
                        )
        return LoopResult(
            state=state, best_score=best_score, best_epoch=best_epoch, history=history
        )
