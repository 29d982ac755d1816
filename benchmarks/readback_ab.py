#!/usr/bin/env python
"""Interleaved fp32-vs-bf16 score-readback A/B (ROADMAP: resolve README #14).

Round 3 measured bf16 score readback *slower* than fp32 at production scale
(EVAL_SCALE_r03_tpu_moment_bf16.json: 346.4 s vs 225.9 s) even though it
moves half the bytes — but the two runs were hours apart on a relay whose
health swings wildly, so the artifact couldn't separate dtype effect from
relay drift. This benchmark settles it by interleaving: one session, one
score matrix shape (the host-engine moment readback unit,
[chunk, n_moments] — retrieval/moment.py host path), alternating
fp32 / bf16 transfers back-to-back for --reps rounds. Relay drift hits both
arms equally; the per-round ratio is the dtype effect.

Run on the real TPU:
  python benchmarks/readback_ab.py --json_out benchmarks/READBACK_AB_r04_tpu.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=16,
                   help="query rows per transfer (host-engine rank_chunk)")
    p.add_argument("--n_moments", type=int, default=1_000_000,
                   help="columns (full-DB moment count is ~1.0e6)")
    p.add_argument("--reps", type=int, default=12)
    p.add_argument("--json_out", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev}")

    key = jax.random.PRNGKey(0)
    scores = jax.random.normal(key, (args.chunk, args.n_moments), jnp.float32)
    jax.block_until_ready(scores)

    # a fresh device array per pull: jax.Array caches the fetched host copy
    # (_npy_value), so re-pulling the same array times a cache hit, not the
    # link (the first run of this benchmark measured 0.0s rounds that way)
    @jax.jit
    def bump(x, r):
        return x + r.astype(x.dtype)

    def fresh(dtype, r):
        x = bump(scores.astype(dtype), jnp.float32(r))
        jax.block_until_ready(x)
        return x

    def pull(x):
        t0 = time.perf_counter()
        import numpy as np

        np.asarray(x)
        return time.perf_counter() - t0

    # warmup both arms (path setup, relay stream init, bump compiles)
    pull(fresh(jnp.float32, -1))
    pull(fresh(jnp.bfloat16, -1))

    rounds, f32, b16, ratios = [], [], [], []
    for r in range(args.reps):
        a32, a16 = fresh(jnp.float32, r), fresh(jnp.bfloat16, r)
        # alternate which arm goes first to cancel any within-round trend
        if r % 2 == 0:
            t32, t16 = pull(a32), pull(a16)
        else:
            t16, t32 = pull(a16), pull(a32)
        f32.append(t32)
        b16.append(t16)
        ratios.append(t16 / max(t32, 1e-9))
        rounds.append(dict(round=r, fp32_s=round(t32, 4), bf16_s=round(t16, 4),
                           ratio=round(ratios[-1], 3)))
        log(f"round {r}: fp32={t32:.3f}s bf16={t16:.3f}s ratio={ratios[-1]:.3f}")
    bytes_f32 = args.chunk * args.n_moments * 4
    report = dict(
        device=str(dev),
        chunk=args.chunk,
        n_moments=args.n_moments,
        reps=args.reps,
        fp32_median_s=round(statistics.median(f32), 4),
        bf16_median_s=round(statistics.median(b16), 4),
        ratio_median=round(statistics.median(ratios), 3),
        ratio_min=round(min(ratios), 3),
        ratio_max=round(max(ratios), 3),
        fp32_gbps=round(bytes_f32 / max(statistics.median(f32), 1e-9) / 1e9, 3),
        bf16_gbps=round(bytes_f32 / 2 / max(statistics.median(b16), 1e-9) / 1e9, 3),
        rounds=rounds,
        verdict=(
            "bf16 faster" if statistics.median(ratios) < 0.9
            else "fp32 faster" if statistics.median(ratios) > 1.1
            else "no material difference"
        ),
    )
    out = json.dumps(report, indent=1)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out + "\n")
        log(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
