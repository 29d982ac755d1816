#!/usr/bin/env python
"""Retrieval-metric quality of the int8 PTQ serving trunk on a CONVERGED
checkpoint.

The quant test suite proves >0.98 embedding cosine and restart-determinism;
this measures what actually matters for serving: the full retrieval metric
dicts (trimmed / clip / moment, base+novel, R@N) of the SAME trained
checkpoint evaluated float vs --trunk_int8 vs --trunk_int8_const, on the
learnable synthetic world the checkpoint was trained on
(benchmarks/synthworld_convergence.py).

Usage (after a convergence run left a checkpoint in the world dir):
  python benchmarks/int8_quality.py --world /tmp/sw_world \
      --method vasa --out benchmarks/INT8_QUALITY_r03_tpu.json

All evaluations run through the real CLI (fresh run_dirs; the cache tag
keys quant mode, so nothing is shared between them); int8 and int8_const
load the same persisted calibration file beside the checkpoint, so their
numerics are pinned identical by construction. A float_rgb_wire reference
row isolates the yuv420-wire effect from quantization: the synthetic
world's textures are RGB-rendered, so 4:2:0 chroma subsampling costs
accuracy THERE (real ActivityNet frames are 4:2:0 on disk — lossless).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import headline_metrics as headline  # noqa: E402

# mode -> (wire, extra flags); deltas are computed vs "float" (same wire
# as the quantized modes, so the comparison isolates quantization)
MODES = {
    "float": ("yuv420", []),
    "int8": ("yuv420", ["--trunk_int8"]),
    "int8_const": ("yuv420", ["--trunk_int8_const"]),
    "float_rgb_wire": ("rgb", []),
}

WIRE_NOTE = (
    "Quantized modes are compared against float on the same yuv420 wire. "
    "float_rgb_wire is the same checkpoint on the rgb wire (it reproduces "
    "the training-time eval): any gap between it and the float column is "
    "the 4:2:0 chroma subsample on the synthetic world's RGB-rendered "
    "textures, NOT quantization. Real ActivityNet frames are 4:2:0 on "
    "disk already, making the yuv420 wire lossless there."
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_eval(args, mode: str, wire: str, extra_flags) -> dict:
    ckpt = os.path.join(args.world, f"run_{args.method}", "checkpoints", "best")
    assert os.path.isdir(ckpt), f"no checkpoint at {ckpt} — run the convergence first"
    run_dir = os.path.join(args.world, f"int8q_{mode}")
    cmd = [
        sys.executable, "main.py",
        "--method", args.method,
        "--evaluate", "--eval_all", "--eval_split", "testing",
        "--test_load", ckpt,
        "--meta_split", os.path.join(args.world, "synth_split.json"),
        "--data_root", args.world,
        "--frame_store", "synthetic_class",
        "--semantic_json", "wordembed_synth_d64.json",
        "--run_dir", run_dir,
        "--wire", wire,
        "--compute_dtype", args.compute_dtype,
        "--workers", "4",
        *extra_flags,
    ]
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"))
    log(f"[{mode}] {' '.join(cmd)}")
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True, env=env)
    wall = time.time() - t0
    with open(os.path.join(run_dir, "metrics", "evaluation.json")) as f:
        metrics = json.load(f)
    return {"wall_s": round(wall, 1), "metrics": metrics}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--world", required=True)
    p.add_argument("--method", default="vasa")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax

    results = {}
    for mode, (wire, flags) in MODES.items():
        results[mode] = run_eval(args, mode, wire, flags)
        log(f"[{mode}] headline: {headline(results[mode]['metrics'])}")

    ref = headline(results["float"]["metrics"])
    deltas = {}
    for mode in ("int8", "int8_const"):
        h = headline(results[mode]["metrics"])
        deltas[mode] = {
            regime: {
                k: round(h[regime][k] - ref[regime][k], 6)
                for k in ref[regime]
                if h.get(regime, {}).get(k) is not None
                and ref[regime][k] is not None
            }
            for regime in ref
        }

    report = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        method=args.method,
        compute_dtype=args.compute_dtype,
        headline={m: headline(r["metrics"]) for m, r in results.items()},
        delta_vs_float=deltas,
        wire_note=WIRE_NOTE,
        wall_s={m: r["wall_s"] for m, r in results.items()},
    )
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
