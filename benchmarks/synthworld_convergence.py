#!/usr/bin/env python
"""Full-recipe convergence on the learnable synthetic world.

The reference's de-facto integration test is "run the real pipeline"
(run_all.sh:3-15). ActivityNet frames are absent in this environment, so
this driver executes the complete CLI recipe — triplet training with
per-epoch losses, periodic trimmed-retrieval validation, best-checkpoint
selection, final all-regime testing eval (main.py:533-620 semantics) —
against the class-textured synthetic world (datagen/synthworld.py), whose
pixels carry the class signal, and records the learning curves + final
metric dicts as one committed JSON artifact.

This is the closest possible stand-in for the blocked real-data runs
(ROADMAP #1): it proves the *mechanics* converge end-to-end on real
hardware — losses fall, validation mAP rises, the best checkpoint is the
one re-evaluated on testing — not that ARV numbers are reproduced.

Run on the real TPU (default backend):
  python benchmarks/synthworld_convergence.py \
      --out benchmarks/SYNTHWORLD_r03_tpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import headline_metrics  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_world(out_dir: str, args) -> None:
    cmd = [
        sys.executable,
        "-m",
        "vqwild_tpu.datagen",
        "synthworld",
        "--out_dir",
        out_dir,
        "--n_base",
        str(args.n_base),
        "--n_val",
        str(args.n_val),
        "--n_test",
        str(args.n_test),
        "--train_per_base",
        str(args.train_per_base),
    ]
    if args.semantic:
        cmd += [
            "--semantic",
            "--latent_dim",
            str(args.latent_dim),
            "--family_size",
            str(args.family_size),
            "--sibling_eps",
            str(args.sibling_eps),
        ]
    subprocess.run(cmd, cwd=REPO, check=True)


def run_method(method: str, world: str, run_dir: str, args) -> dict:
    cmd = [
        sys.executable,
        "main.py",
        "--method",
        method,
        "--meta_split",
        os.path.join(world, "synth_split.json"),
        "--data_root",
        world,
        "--frame_store",
        "synthetic_class",
        "--semantic_json",
        "wordembed_synth_d64.json",
        "--run_dir",
        run_dir,
        "--epochs",
        str(args.epochs),
        "--eval_per_epoch",
        str(args.eval_per_epoch),
        "--batch_size",
        str(args.batch_size),
        "--workers",
        "4",
        "--compute_dtype",
        args.compute_dtype,
        "--eval_all",
    ]
    if args.scan_steps > 1:
        cmd += ["--scan_steps", str(args.scan_steps)]
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
    )
    log(f"[{method}] {' '.join(cmd)}")
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True, env=env)
    wall = time.time() - t0

    with open(os.path.join(run_dir, "metrics", "train_history.json")) as f:
        hist = json.load(f)
    final = {}
    eval_path = os.path.join(run_dir, "metrics", "evaluation.json")
    if os.path.isfile(eval_path):
        with open(eval_path) as f:
            final = json.load(f)

    return dict(
        method=method,
        wall_s=round(wall, 1),
        best_score=hist["best_score"],
        best_epoch=hist["best_epoch"],
        history=hist["history"],
        final_testing=headline_metrics(final),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--methods", default="baseline,vasa")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--eval_per_epoch", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--scan_steps", type=int, default=1)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--n_base", type=int, default=16)
    p.add_argument("--n_val", type=int, default=4)
    p.add_argument("--n_test", type=int, default=4)
    p.add_argument("--train_per_base", type=int, default=12)
    p.add_argument("--semantic", action="store_true",
                   help="semantically coupled world (novel sibling families "
                        "whose separation needs the latent the va/vasa "
                        "auxiliary losses inject; synthworld.py module doc)")
    p.add_argument("--latent_dim", type=int, default=8)
    p.add_argument("--family_size", type=int, default=2)
    p.add_argument("--sibling_eps", type=float, default=0.35)
    p.add_argument("--world", default="", help="reuse an existing world dir")
    p.add_argument("--out", default="")
    args = p.parse_args()

    world = args.world or tempfile.mkdtemp(prefix="synthworld_")
    if not os.path.isfile(os.path.join(world, "synth_split.json")):
        build_world(world, args)

    import jax  # after world build (subprocesses own their backends)

    results = []
    for method in args.methods.split(","):
        run_dir = os.path.join(world, f"run_{method}")
        results.append(run_method(method, world, run_dir, args))
        r = results[-1]
        curve = [
            (e["epoch"], round(e.get("ap", float("nan")), 4))
            for e in r["history"]
            if "ap" in e
        ]
        log(f"[{method}] best={r['best_score']:.4f}@{r['best_epoch']} curve={curve}")

    report = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        config=dict(
            epochs=args.epochs,
            batch_size=args.batch_size,
            compute_dtype=args.compute_dtype,
            n_base=args.n_base,
            n_val=args.n_val,
            n_test=args.n_test,
            train_per_base=args.train_per_base,
            semantic=args.semantic,
            latent_dim=args.latent_dim,
            family_size=args.family_size,
            sibling_eps=args.sibling_eps,
        ),
        results=results,
    )
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
