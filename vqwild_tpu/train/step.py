"""The jitted training step.

Per-method loss assembly mirrors the reference train loops (main.py:332-531):
  baseline: CE(classifier logits)
  va:       CE(non-local logits) + CE(register logits)
  vasa:     + CE(word logits)
all with targets expanded per clip (anchor, positive, negative → 3 labels per
triplet, main.py:348-359).

The optimizer reproduces torch Adam(lr=1e-4, weight_decay=1e-5): L2 decay is
added to the gradient *before* the Adam moments (torch semantics, not AdamW),
and the LR steps ×0.1 at epoch ``lr_decay_rate`` (main.py:176-191).

TPU-first structure: the step consumes *cropped uint8 clips* (crop/flip are
memcpy-cheap host slicing in the loader threads; see ops/preprocess.py) and
fuses ToTensor+ImageNet normalization into the jit graph, so the host ships
4×-smaller uint8 and normalization overlaps MXU work. The EMA visual memory
rides in TrainState (explicit carried state); under a data mesh the update is
computed from the global batch, keeping replicas consistent by construction —
a semantic the reference's single-process DataParallel never had to define.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vqwild_tpu.models.arv import ARVModel
from vqwild_tpu.ops.preprocess import normalize_clips


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    memory: Any  # {} for baseline
    dropout_rng: jnp.ndarray


def make_optimizer(
    init_lr: float,
    weight_decay: float,
    steps_per_epoch: int,
    lr_decay_epoch: int,
    lr_decay_factor: float = 0.1,
    accum_grad: int = 1,
    optimizer: str = "adam",
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """``optimizer`` mirrors the reference's adam|sgd switch (main.py:553-567):
    both apply L2 decay to the gradient *before* the moment/momentum state
    (torch Adam/SGD semantics). SGD is torch's dampening=0, nesterov=False
    buffer — ``buf = momentum*buf + g``, step ``-lr*buf`` — which is exactly
    ``optax.trace(decay=momentum)``."""
    # optax.MultiSteps advances the inner schedule once per accum_grad loader
    # steps, so the decay boundary must be expressed in optimizer updates
    updates_per_epoch = max(1, steps_per_epoch // max(1, accum_grad))
    schedule = optax.piecewise_constant_schedule(
        init_value=init_lr,
        boundaries_and_scales={updates_per_epoch * lr_decay_epoch: lr_decay_factor},
    )
    if optimizer == "adam":
        inner = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer == "sgd":
        inner = optax.trace(decay=momentum, nesterov=False)
    else:
        raise ValueError(f"invalid optimizer {optimizer!r} (adam|sgd)")
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),  # torch L2 (pre-moment)
        inner,
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx


def create_train_state(
    model: ARVModel,
    params,
    state_vars,
    tx: optax.GradientTransformation,
    rng,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=state_vars.get("batch_stats", {}),
        memory=state_vars.get("memory", {}),
        dropout_rng=rng,
    )


def make_train_step(
    model: ARVModel,
    tx: optax.GradientTransformation,
    semantic_memory: Optional[jnp.ndarray] = None,
    donate: bool = True,
    ranking_weight: float = 0.0,
    triplet_margin: float = 1.0,
    wire: str = "rgb",
    _raw: bool = False,
) -> Callable:
    """ranking_weight > 0 adds a triplet ranking loss over the loader's
    (anchor, positive, negative) batch structure — the structure the reference
    builds but never exploits (its train_ranking, main.py:263-329, is dead
    code identical to train_va). Strictly additive capability.

    ``wire="yuv420"`` makes the step consume cropped 4:2:0 planes —
    step(state, y_u8, uv_u8, labels) — with the chroma upsample + BT.601 +
    normalize fused into the jit (ops/preprocess.normalize_clips_yuv420),
    halving the host→device transfer like the eval wire.

    ``_raw=True`` returns the un-jitted step body (for make_scanned_train_step)."""
    if wire not in ("rgb", "yuv420"):
        raise ValueError(f"unknown wire format {wire!r}")
    method = model.method
    ce = optax.softmax_cross_entropy_with_integer_labels

    def step_fn(state: TrainState, *wire_and_labels, weights=None):
        """rgb wire: (clips_u8 [B,T,s,s,C], labels [B]);
        yuv420 wire: (y_u8 [B,T,s,s], uv_u8 [B,T,s/2,s/2,2], labels [B]).

        ``weights`` (0/1 per row, optional): rows padded to a mesh multiple
        (train/loop.py) carry weight 0 — losses become weighted means and the
        EMA memory skips them. Trunk/non-local BatchNorm batch statistics do
        see padded rows (documented divergence: the tiny duplicate-row bias is
        the analogue of upstream DataParallel's per-replica BN stats)."""
        *wire_arrays, labels = wire_and_labels
        rng, new_rng = jax.random.split(state.dropout_rng)
        if wire == "yuv420":
            from vqwild_tpu.ops.preprocess import normalize_clips_yuv420

            clips = normalize_clips_yuv420(*wire_arrays, out_dtype=model.dtype)
        else:
            (clips_u8,) = wire_arrays
            clips = normalize_clips(clips_u8, out_dtype=model.dtype)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            mutable = ["batch_stats"]
            if method in ("va", "vasa"):
                variables["memory"] = state.memory
                mutable.append("memory")
            out, muts = model.apply(
                variables,
                clips,
                targets=labels,
                semantic_memory=semantic_memory,
                train=True,
                mutable=mutable,
                rngs={"dropout": rng},
                sample_weights=weights,
            )

            def wmean(per_row):
                if weights is None:
                    return per_row.mean()
                return (per_row * weights).sum() / jnp.maximum(weights.sum(), 1.0)

            def xent(logits):
                # CE always in fp32: under bf16 compute (mixed-precision
                # training) the softmax/log must not run at 8-bit mantissa
                return ce(logits.astype(jnp.float32), labels)

            if method == "baseline":
                ce_loss = wmean(xent(out.logits))
                losses = {"ce_loss": ce_loss}
                total = ce_loss
            elif method == "va":
                ce_loss = wmean(xent(out.nled_logits))
                reg_loss = wmean(xent(out.reg_logits))
                losses = {"ce_loss": ce_loss, "reg_loss": reg_loss}
                total = ce_loss + reg_loss
            else:  # vasa
                ce_loss = wmean(xent(out.nled_logits))
                reg_loss = wmean(xent(out.reg_logits))
                word_loss = wmean(xent(out.word_logits))
                losses = {
                    "ce_loss": ce_loss,
                    "reg_loss": reg_loss,
                    "word_loss": word_loss,
                }
                total = ce_loss + reg_loss + word_loss
            if ranking_weight > 0.0:
                # padded rows sit at the tail; whole triplets stay intact —
                # truncate to full triplets and weight each by its members
                n3 = (out.clip_embed.shape[0] // 3) * 3
                e = out.clip_embed[:n3].reshape(-1, 3, out.clip_embed.shape[-1])
                d_ap = jnp.sum((e[:, 0] - e[:, 1]) ** 2, axis=-1)
                d_an = jnp.sum((e[:, 0] - e[:, 2]) ** 2, axis=-1)
                per_triplet = jax.nn.relu(d_ap - d_an + triplet_margin)
                if weights is None:
                    rank_loss = per_triplet.mean()
                else:
                    w3 = weights[:n3].reshape(-1, 3).min(axis=1)
                    rank_loss = (per_triplet * w3).sum() / jnp.maximum(w3.sum(), 1.0)
                losses["ranking_loss"] = rank_loss
                total = total + ranking_weight * rank_loss
            losses["loss"] = total
            return total, (losses, muts)

        (_, (losses, muts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=muts["batch_stats"],
            memory=muts.get("memory", state.memory),
            dropout_rng=new_rng,
        )
        return new_state, losses

    if _raw:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_scanned_train_step(
    model: ARVModel,
    tx: optax.GradientTransformation,
    semantic_memory: Optional[jnp.ndarray] = None,
    donate: bool = True,
    ranking_weight: float = 0.0,
    triplet_margin: float = 1.0,
    wire: str = "rgb",
) -> Callable:
    """K train steps per dispatch via ``lax.scan`` — the dispatch-amortized
    inner loop (one XLA program per K steps instead of K).

    The per-step host→device round trip is pure overhead for a model this
    size: the TrainState pytree is ~350 buffers, and materializing them
    between dependent dispatches can cost several times the step's compute
    (measured 415 ms/step dispatched vs ~50 ms compute on v5e behind a
    remote relay; on-host TPU dispatch is cheaper but never free). Scanning
    keeps the state on device for the whole window.

    Returned fn: ``(state, *wire_arrays, labels, weights=None)`` where every
    array has a leading scan axis [K, ...]; returns ``(state, losses)`` with
    each loss stacked [K] (the per-step trajectory).
    """
    step_fn = make_train_step(
        model,
        tx,
        semantic_memory=semantic_memory,
        ranking_weight=ranking_weight,
        triplet_margin=triplet_margin,
        wire=wire,
        _raw=True,
    )

    def scanned(state: TrainState, *wire_and_labels, weights=None):
        from flax.core import unfreeze

        # model.apply's mutable collections come back as plain dicts; the
        # scan carry must be structure-stable, so unfreeze any FrozenDicts
        state = state.replace(
            batch_stats=unfreeze(state.batch_stats),
            memory=unfreeze(state.memory),
        )
        xs = wire_and_labels if weights is None else wire_and_labels + (weights,)

        def body(carry, batch):
            if weights is None:
                new_state, losses = step_fn(carry, *batch)
            else:
                new_state, losses = step_fn(carry, *batch[:-1], weights=batch[-1])
            return new_state, losses

        return jax.lax.scan(body, state, xs)

    return jax.jit(scanned, donate_argnums=(0,) if donate else ())
