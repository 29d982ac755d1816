#!/usr/bin/env python
"""Microbenchmark the device moment engine's three cost centers in isolation.

Times, at the real untrimmed-DB bucket mix (profile_moment_chunk.build_geometry):
  1. the per-bucket 6-operand payload sorts ([Q, Vb, W] along W),
  2. the greedy-NMS fori_loop at the same shapes,
  3. the final AP payload sort ([Q, sum(Vb*W)]),
so optimization effort goes to the dominant stage. Timed through a device_get
of a scalar reduction — block_until_ready does not wait under the
remote-dispatch relay.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="")
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--q", type=int, default=32)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from vqwild_tpu.core.hostsig import host_cpu_signature

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(repo, ".jax_cache", f"host-{host_cpu_signature()}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from benchmarks.profile_moment_chunk import build_geometry
    from vqwild_tpu.retrieval import moment_device as md

    vidx, s_sec, e_sec, h_label, h_iou, n_videos = build_geometry()
    plan = md._bucket_plan(np.asarray(vidx, np.int64), n_videos)
    shapes = [(b["gather"].shape) for b in plan]
    total_pad = sum(v * w for v, w in shapes)
    print(f"buckets: {shapes} (padded {total_pad}, raw {len(vidx)})", flush=True)

    q = args.q
    rng = np.random.default_rng(0)

    def timed(name, fn, *xs):
        fn_j = jax.jit(fn)
        out = fn_j(*xs)  # compile
        float(np.asarray(jax.device_get(out)))
        times = []
        for _ in range(args.repeat):
            t0 = time.time()
            float(np.asarray(jax.device_get(fn_j(*xs))))
            times.append(time.time() - t0)
        print(f"{name:28s} {min(times):7.3f}s  (all {[round(t,3) for t in times]})",
              flush=True)
        return min(times)

    # per-bucket arrays on device
    dev = []
    for v, w in shapes:
        dev.append(
            dict(
                sb=jax.device_put(rng.standard_normal((q, v, w), np.float32)),
                c=[jax.device_put(rng.standard_normal((v, w), np.float32))
                   for _ in range(5)],
            )
        )

    def bucket_sorts_6(*bufs):
        acc = 0.0
        i = 0
        for v, w in shapes:
            sb = bufs[i]; i += 1
            cs = bufs[i:i + 5]; i += 5
            bcast = lambda a: jnp.broadcast_to(a[None], (q, v, w))
            outs = jax.lax.sort(
                (-sb,) + tuple(bcast(a) for a in cs),
                dimension=2, is_stable=True, num_keys=1,
            )
            acc += outs[0][0, 0, 0]
        return acc

    def bucket_sorts_2(*bufs):
        acc = 0.0
        i = 0
        for v, w in shapes:
            sb = bufs[i]; i += 1
            packed = bufs[i].astype(jnp.int32); i += 5
            bcast = jnp.broadcast_to(packed[None], (q, v, w))
            outs = jax.lax.sort(
                (-sb, bcast), dimension=2, is_stable=True, num_keys=1
            )
            acc += outs[0][0, 0, 0] + outs[1][0, 0, 0]
        return acc

    def nms_only(*bufs):
        acc = 0.0
        i = 0
        for v, w in shapes:
            sb = bufs[i]; i += 1
            st = bufs[i]; en = bufs[i + 1]; i += 5
            stb = jnp.broadcast_to(st[None], (q, v, w))
            enb = jnp.broadcast_to(en[None], (q, v, w))
            kept = md._nms_sorted(sb, stb, enb, 0.5)
            acc += kept.sum()
        return acc

    flat = []
    for d in dev:
        flat.append(d["sb"])
        flat.extend(d["c"])

    big = jax.device_put(
        rng.standard_normal((q, total_pad), np.float32)
    )
    tp = jax.device_put(rng.standard_normal((q, total_pad)).astype(np.float32) > 1.0)

    def final_sort(s_m, t_m):
        key, tps = jax.lax.sort((-s_m, t_m), dimension=1, is_stable=True,
                                num_keys=1)
        return key[0, 0].astype(jnp.float32) + tps[0, 0]

    def final_count_ap(s_m, t_m, k):
        # sort-free AP inner loop: top-k tp thresholds + blocked counting
        thr = jax.lax.top_k(jnp.where(t_m, s_m, -jnp.inf), k)[0]  # [Q, k]
        blocks = 64
        bw = s_m.shape[1] // blocks

        def body(carry, j):
            n_geq, tp_geq = carry
            sl = jax.lax.dynamic_slice_in_dim(s_m, j * bw, bw, axis=1)
            tl = jax.lax.dynamic_slice_in_dim(t_m, j * bw, bw, axis=1)
            ge = sl[:, None, :] >= thr[:, :, None]  # [Q, k, bw]
            n_geq = n_geq + ge.sum(axis=2, dtype=jnp.int32)
            tp_geq = tp_geq + (ge & tl[:, None, :]).sum(axis=2, dtype=jnp.int32)
            return (n_geq, tp_geq), 0.0

        init = (jnp.zeros((q, k), jnp.int32), jnp.zeros((q, k), jnp.int32))
        (n_geq, tp_geq), _ = jax.lax.scan(body, init, jnp.arange(blocks))
        ap = jnp.where(thr > -jnp.inf, tp_geq / jnp.maximum(n_geq, 1), 0.0).sum(1)
        return ap.sum()

    timed("bucket_sorts_6payload", bucket_sorts_6, *flat)
    timed("bucket_sorts_2payload", bucket_sorts_2, *flat)
    timed("nms_fori", nms_only, *flat)
    timed("final_sort_2payload", final_sort, big, tp)
    timed("count_ap_k512", functools.partial(final_count_ap, k=512), big, tp)
    timed("count_ap_k2048", functools.partial(final_count_ap, k=2048), big, tp)


if __name__ == "__main__":
    main()
