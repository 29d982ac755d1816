#!/usr/bin/env python
"""Attribute the device moment engine's per-chunk cost to its stages.

The full-DB moment eval's remaining wall time is ~pure device compute
(~2.9 s per 32-query chunk over the 1.65M-window gallery,
benchmarks/EVAL_SCALE_r05_tpu_warm.json). This tool times ONE warm chunk
program and ablated variants (NMS loop skipped / final AP sort skipped) so
optimization effort goes where the seconds are. Geometry comes from the real
untrimmed DB; features are fake (the cost under test is the metric program,
not the trunk).

Usage: python benchmarks/profile_moment_chunk.py [--platform cpu] [--repeat 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_geometry(meta_split="100_20_80"):
    import numpy as np

    from vqwild_tpu.apps.cli import resolve_data_file
    from vqwild_tpu.data.labels import get_split
    from vqwild_tpu.data.schema import load_moment_db
    from vqwild_tpu.retrieval.moment import (
        closest_hits_vectorized,
        enumerate_moment_windows,
    )

    spec = get_split(meta_split)
    mdb = load_moment_db(resolve_data_file(spec.moment_db_json, "data"))
    possible = set(spec.possible_classes("testing"))
    vidx, s_sec, e_sec, h_label, h_iou = [], [], [], [], []
    for vi, video in enumerate(mdb.gallery):
        n_frames = max(1, int(video.activitynet_duration * 3))
        starts, ends, locs = enumerate_moment_windows(
            video.activitynet_duration, n_frames, 5, 20, 3.0, 1
        )
        if len(starts) == 0:
            continue
        labels_v, ious_v = closest_hits_vectorized(
            video.annotations, locs, possible
        )
        vidx.append(np.full(len(starts), vi, np.int64))
        s_sec.append(locs[:, 0])
        e_sec.append(locs[:, 1])
        h_label.append(labels_v)
        h_iou.append(ious_v)
    return (
        np.concatenate(vidx),
        np.concatenate(s_sec),
        np.concatenate(e_sec),
        np.concatenate(h_label).astype(str),
        np.concatenate(h_iou),
        len(mdb.gallery),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="")
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--scan_chunks", type=int, default=4)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--json_out", default="")
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

    import numpy as np

    from vqwild_tpu.retrieval import moment_device as md

    print("building real-DB geometry...", flush=True)
    vidx, s_sec, e_sec, h_label, h_iou, n_videos = build_geometry()
    g = len(vidx)
    print(f"{g} moments / {n_videos} videos", flush=True)

    rng = np.random.default_rng(0)
    gallery = jax.device_put(
        rng.standard_normal((g, args.dim), np.float32)
    ).block_until_ready()
    q_bank = jax.device_put(
        rng.standard_normal((64, args.dim), np.float32)
    ).block_until_ready()

    engine = md.DeviceMomentEngine(
        vidx, s_sec, e_sec, h_label, h_iou, n_videos, chunk=32
    )
    b = engine.chunk
    s = args.scan_chunks
    q_rows = np.full((s, b, 1), 0, np.int32)
    q_rows[:, :, 0] = (np.arange(s * b) % 64).reshape(s, b)
    q_labels = np.zeros((s, b), np.int32)
    ignore = np.full((s, b, engine.max_ignore), -1, np.int32)
    r_at_n = (10, 100)

    def run_variant(name):
        engine._warmed_scan.clear()
        t0 = time.time()
        engine.warm_scan(q_bank.shape, gallery.shape, s, 1, r_at_n, True)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.repeat):
            t0 = time.time()
            h = engine.dispatch_scan(
                q_bank, gallery, q_rows, q_labels, ignore, r_at_n, True
            )
            # block_until_ready does NOT wait on the remote-dispatch relay —
            # fetch the scalars (the eval's own readback) to time execution
            engine.finalize_scan(h)
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{name:14s} compile {compile_s:6.1f}s  exec {best:7.3f}s  "
            f"(all: {[round(t, 3) for t in times]})",
            flush=True,
        )
        return best

    report = {
        "platform": jax.devices()[0].platform,
        "moments": g,
        "videos": n_videos,
        "host_cpu_signature": host_cpu_signature(),
        "host_cpus": os.cpu_count(),
    }

    report["full_s"] = run_variant("full")

    # ablate the greedy-NMS loop: keep every real member
    orig_nms = md._nms_sorted
    md._nms_sorted = lambda ss, st, en, t: ss > -np.inf
    try:
        report["no_nms_s"] = run_variant("no-nms")
    finally:
        md._nms_sorted = orig_nms

    report["nms_share"] = round(1 - report["no_nms_s"] / report["full_s"], 3)
    print(json.dumps(report, indent=1), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
