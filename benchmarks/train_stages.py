#!/usr/bin/env python
"""Train-step cost decomposition on the real TPU (vasa, production shapes).

The eval trunk's plateau is measured stage-by-stage (trunk_stages.py /
docs/TRUNK_PROFILE.md); this does the same for the *training* step, by
ablation deltas instead of graph truncation (fwd and bwd fuse — truncating
mid-graph would change what XLA can overlap):

  fwd_eval   forward + loss with running-stats BN, no dropout   (inference-
             mode numerics at train shapes — the floor for any fwd)
  fwd        forward + loss, train=True (batch-stat BN, dropout, EMA memory)
             delta vs fwd_eval = the cost of training-mode statistics
  fwd_bwd    + value_and_grad                delta = backward pass
  full       + Adam update + state swap      delta = optimizer/elementwise
  scan16     the production lax.scan x16 inner loop, per-step
  full_s2d   full with the stem lowered to space-to-depth (cin 3->12): the
             bwd-input conv of the cin=3 conv7 stem produces a 3-channel
             gradient image (3/128 MXU lanes) — s2d makes that 12

Variants run individually (CLI args) so a flaky relay can't strand a whole
sweep; each prints one JSON line. Data and state stay device-resident;
readback is the scalar loss. Best-of-sweeps. Roofline context: fwd trunk
~0.97 GFLOP/frame at 112² (TRUNK_PROFILE.md stage table), bwd ~2x fwd, so
fwd+bwd MXU SOL at 960 frames ≈ 14.2 ms on the v5e's 197 TFLOP/s bf16.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = 32
CROP = 112
CLIPS = 30
NCLASS = 200
SEM_DIM = 300


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    variants = sys.argv[1:] or ["fwd_eval", "fwd", "fwd_bwd", "full", "scan16"]
    import jax

    from vqwild_tpu.core.hostsig import host_cpu_signature

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".jax_cache", f"host-{host_cpu_signature()}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "cpu" not in (os.environ.get("JAX_PLATFORMS") or ""):
        jax.config.update(
            "jax_platforms", (os.environ.get("JAX_PLATFORMS") or "axon") + ",cpu"
        )
    import jax.numpy as jnp

    from vqwild_tpu.core.config import ModelConfig
    from vqwild_tpu.models import build_model, init_model
    from vqwild_tpu.ops.preprocess import normalize_clips_yuv420
    from vqwild_tpu.train.step import (
        create_train_state,
        make_optimizer,
        make_scanned_train_step,
        make_train_step,
    )

    def build(stem_s2d=False):
        model = build_model(
            ModelConfig(
                method="vasa", nclass=NCLASS, semantic_dim=SEM_DIM,
                compute_dtype="bfloat16", stem_s2d=stem_s2d,
            )
        )
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            params, state_vars = init_model(
                model, jax.random.PRNGKey(0), (1, 2, CROP, CROP, 3),
                semantic_dim=SEM_DIM,
            )
            tx = make_optimizer(
                init_lr=1e-4, weight_decay=1e-5, steps_per_epoch=100,
                lr_decay_epoch=9,
            )
            state = create_train_state(
                model, params, state_vars, tx, jax.random.PRNGKey(1)
            )
        dev = jax.devices()[0]
        return model, tx, jax.device_put(state, dev), dev

    model, tx, state, dev = build()
    rng = np.random.default_rng(2)
    sem = jax.device_put(
        rng.normal(size=(NCLASS, SEM_DIM)).astype(np.float32) * 0.05, dev
    )
    y = jax.device_put(
        rng.integers(0, 255, (CLIPS, FRAMES, CROP, CROP), dtype=np.uint8), dev
    )
    uv = jax.device_put(
        rng.integers(0, 255, (CLIPS, FRAMES, CROP // 2, CROP // 2, 2), dtype=np.uint8),
        dev,
    )
    labels = jax.device_put(
        np.repeat(rng.integers(0, NCLASS, CLIPS // 3), 3).astype(np.int32), dev
    )
    ce = None  # set below

    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels

    def loss_from_out(out):
        def xent(logits):
            return ce(logits.astype(jnp.float32), labels).mean()

        return xent(out.nled_logits) + xent(out.reg_logits) + xent(out.word_logits)

    def make_fwd(train: bool):
        def f(params, batch_stats, memory, rng_key, y_u8, uv_u8):
            clips = normalize_clips_yuv420(y_u8, uv_u8, out_dtype=model.dtype)
            variables = {
                "params": params, "batch_stats": batch_stats, "memory": memory,
            }
            if train:
                out, _ = model.apply(
                    variables, clips, targets=labels, semantic_memory=sem,
                    train=True, mutable=["batch_stats", "memory"],
                    rngs={"dropout": rng_key},
                )
            else:
                # eval mode returns embeddings only (heads are train-path;
                # they are ~0.1% of the FLOPs) — this variant times the
                # trunk fwd with running-stats BN and no dropout
                out = model.apply(variables, clips, train=False)
                return jnp.mean(out.frame_embed.astype(jnp.float32))
            return loss_from_out(out)

        return jax.jit(f)

    def make_fwd_bwd():
        def f(params, batch_stats, memory, rng_key, y_u8, uv_u8):
            def loss_fn(p):
                clips = normalize_clips_yuv420(y_u8, uv_u8, out_dtype=model.dtype)
                variables = {
                    "params": p, "batch_stats": batch_stats, "memory": memory,
                }
                out, _ = model.apply(
                    variables, clips, targets=labels, semantic_memory=sem,
                    train=True, mutable=["batch_stats", "memory"],
                    rngs={"dropout": rng_key},
                )
                return loss_from_out(out)

            l, g = jax.value_and_grad(loss_fn)(params)
            # tiny scalar so every grad leaf is live but readback is 4 bytes
            gs = sum(jnp.sum(a.astype(jnp.float32) ** 2) for a in jax.tree_util.tree_leaves(g))
            return l + 0.0 * gs, gs

        return jax.jit(f)

    results = {}

    def time_call(name, call, block):
        t0 = time.time()
        block(call())
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        best = 1e18
        for _ in range(5):
            t0 = time.time()
            r = None
            for _ in range(8):
                r = call()
            block(r)
            dt = (time.time() - t0) / 8
            best = min(best, dt)
        results[name] = round(best * 1000, 2)
        log(f"  {name}: {best*1000:.2f} ms best")

    rk = jax.random.PRNGKey(3)
    for v in variants:
        if v == "fwd_eval":
            f = make_fwd(False)
            time_call(v, lambda: f(state.params, state.batch_stats, state.memory, rk, y, uv),
                      lambda r: np.asarray(r))
        elif v == "fwd":
            f = make_fwd(True)
            time_call(v, lambda: f(state.params, state.batch_stats, state.memory, rk, y, uv),
                      lambda r: np.asarray(r))
        elif v == "fwd_bwd":
            f = make_fwd_bwd()
            time_call(v, lambda: f(state.params, state.batch_stats, state.memory, rk, y, uv),
                      lambda r: np.asarray(r[0]))
        elif v in ("full", "full_s2d"):
            if v == "full_s2d":
                m2, tx2, st2, _ = build(stem_s2d=True)
                stepf = make_train_step(m2, tx2, semantic_memory=sem, wire="yuv420",
                                        donate=False)
                st = [st2]
            else:
                stepf = make_train_step(model, tx, semantic_memory=sem, wire="yuv420",
                                        donate=False)
                st = [state]

            def call(st=st, stepf=stepf):
                ns, losses = stepf(st[0], y, uv, labels)
                st[0] = ns
                return losses["loss"]

            time_call(v, call, lambda r: np.asarray(r))
        elif v == "scan16":
            K = 16
            stepf = make_scanned_train_step(model, tx, semantic_memory=sem,
                                            wire="yuv420", donate=False)
            tile = jax.jit(lambda a: jnp.stack([a] * K))
            ys, uvs, labs = tile(y), tile(uv), tile(labels)
            t0 = time.time()
            _, losses = stepf(state, ys, uvs, labs)
            np.asarray(losses["loss"])
            log(f"scan16: compile+first {time.time()-t0:.1f}s")
            best = 1e18
            for _ in range(4):
                t0 = time.time()
                _, losses = stepf(state, ys, uvs, labs)
                jax.block_until_ready(losses["loss"])
                best = min(best, (time.time() - t0) / K)
            results[v] = round(best * 1000, 2)
            log(f"  scan16: {best*1000:.2f} ms/step best")
        else:
            raise SystemExit(f"unknown variant {v!r}")

    print(json.dumps({"shapes": f"{CLIPS}x{FRAMES}x{CROP}", "dtype": "bfloat16",
                      "ms": results}))


if __name__ == "__main__":
    main()
