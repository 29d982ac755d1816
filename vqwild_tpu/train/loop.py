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
from vqwild_tpu.parallel.mesh import pad_to_multiple, shard_batch_arrays
from vqwild_tpu.train.checkpoint import CheckpointManager
from vqwild_tpu.train.step import TrainState

log = get_logger("train.loop")


@dataclasses.dataclass
class LoopResult:
    state: TrainState
    best_score: float
    best_epoch: int
    history: list


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
    ):
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

    def run(self, state: TrainState) -> LoopResult:
        best_score, best_epoch = -1.0, -1
        history = []
        for epoch in range(self.start_epoch, self.epochs):
            timer = Timer()
            data_time = AverageMeter()
            loss_meters: Dict[str, AverageMeter] = {}
            nsteps = 0

            # one-batch lookahead: ship batch k+1 to device while step k runs
            # (jax dispatch is async, so _put overlaps the device compute)
            def batches():
                it = iter(self.loader.epoch(epoch))
                nxt = next(it, None)
                while nxt is not None:
                    cur = self._put(nxt)
                    nxt = next(it, None)
                    yield cur

            pending = []  # device-scalar losses; synced only at print time so
            # per-step readback never serializes the async dispatch queue
            for i, arrays in enumerate(batches()):
                if self.max_steps is not None and i >= self.max_steps:
                    break
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
                    for entry in pending:
                        for k, v in entry.items():
                            loss_meters.setdefault(k, AverageMeter()).update(float(v))
                    pending.clear()
                    log.info(
                        "[%d][%d] %s dataload=%.3fs best=%.3f",
                        epoch,
                        i,
                        " ".join(
                            f"{k}={m.avg:.4f}" for k, m in sorted(loss_meters.items())
                        ),
                        data_time.avg,
                        best_score,
                    )
            for entry in pending:
                for k, v in entry.items():
                    loss_meters.setdefault(k, AverageMeter()).update(float(v))
            pending.clear()
            log.info(
                "epoch %d done: %d steps, %s",
                epoch,
                nsteps,
                " ".join(f"{k}={m.avg:.4f}" for k, m in sorted(loss_meters.items())),
            )

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
                history.append(dict(epoch=epoch, ap=ap))
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
