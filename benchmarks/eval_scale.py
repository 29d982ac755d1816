#!/usr/bin/env python
"""Production-scale evaluation benchmark (fake features, real ARV DBs).

Exercises the full evaluation stack at the real dataset scale — the
reference's known scaling pain points (SURVEY §7: exact-L2 full ranking over
~10^5-10^6 moment windows with per-query NMS) — without needing frames or a
trained model. Frame counts come from the real video durations, so gallery
tapes, clip windows, and moment enumeration hit production sizes.

Usage:  python benchmarks/eval_scale.py [--moment_queries 100] [--platform cpu]
"""

import argparse
import faulthandler
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta_split", default="100_20_80")
    p.add_argument("--data_root", default="data")
    p.add_argument("--moment_queries", type=int, default=100,
                   help="subsample of moment queries (full QxG scoring is matmul-bound)")
    p.add_argument("--platform", default="")
    p.add_argument("--skip_moment", action="store_true")
    p.add_argument("--moment_engine", default="auto",
                   choices=["auto", "device", "host"],
                   help="moment postprocess engine (retrieval/moment.py)")
    p.add_argument("--moment_scan_chunks", type=int, default=16,
                   help="device-engine query chunks per compiled program "
                        "(0 = per-chunk dispatch)")
    p.add_argument("--phases", default="trimmed,clip,moment",
                   help="comma subset; run each phase in its own process "
                        "for a fresh relay stream (compile RPCs have been "
                        "observed to wedge only in processes that already "
                        "ran a prior eval phase)")
    p.add_argument("--json_out", default="",
                   help="write totals + per-phase moment timings as JSON")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache (host-signed like bench.py): the eval kernels
    # at production shape take 5-15 s to compile, and a compile round-trip is
    # a window for the dev relay's sporadic stream wedges — cache so reruns
    # skip it entirely
    from vqwild_tpu.core.hostsig import host_cpu_signature

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(repo, ".jax_cache", f"host-{host_cpu_signature()}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from vqwild_tpu.apps.cli import resolve_data_file
    from vqwild_tpu.data.frames import SyntheticFrameStore
    from vqwild_tpu.data.labels import get_split
    from vqwild_tpu.data.schema import load_moment_db, load_trimmed_db
    from vqwild_tpu.retrieval import (
        ARVRetrievalClip,
        ARVRetrievalMoment,
        ARVRetrievalTrimmed,
    )
    from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn

    class DurationFrameStore(SyntheticFrameStore):
        """Synthetic frames with real per-video frame counts (duration × fps)."""

        def __init__(self, durations):
            super().__init__()
            self.durations = durations

        def num_frames(self, subset, video_id):
            return max(1, int(self.durations.get(video_id, 21.0) * 3))

    spec = get_split(args.meta_split)
    db = load_trimmed_db(resolve_data_file(spec.db_json, args.data_root))
    mdb = load_moment_db(resolve_data_file(spec.moment_db_json, args.data_root))
    durations = {}
    for split in db.splits.values():
        for recs in split.values():
            for r in recs:
                durations[r.video_id] = r.activitynet_duration
    for r in list(mdb.query) + list(mdb.gallery):
        durations[r.video_id] = r.activitynet_duration

    def extractor():
        return FeatureExtractor(
            make_fake_feat_fn(512, seed=0),
            DurationFrameStore(durations),
            test_frames=32,
            test_batch_size=30,
            input_size=112,
            fake=True,
        )

    print(f"devices: {jax.devices()}", flush=True)
    # host identity in every artifact: cross-round rows are incomparable
    # without it (r04's 1-core box made the same phase 4x slower than r03's)
    report = {
        "platform": jax.devices()[0].platform,
        "meta_split": args.meta_split,
        "host_cpu_signature": host_cpu_signature(),
        "host_cpus": os.cpu_count(),
    }

    def phases(ev):
        return {k: round(v, 2) for k, v in sorted(ev.timings.items())}

    run = args.phases.split(",")

    if "trimmed" in run:
        t0 = time.time()
        ev_t = ARVRetrievalTrimmed(db, spec, extractor(), eval_split="testing")
        r = ev_t.evaluation()
        report["trimmed_s"] = round(time.time() - t0, 2)
        report["trimmed_ap"] = round(float(r["ap"]), 6)
        report["trimmed_phases_s"] = phases(ev_t)
        print(f"TRIMMED  full-scale: {report['trimmed_s']:.1f}s  ap={r['ap']:.4f}", flush=True)
        print(f"TRIMMED phases: {report['trimmed_phases_s']}", flush=True)

    if "clip" in run:
        t0 = time.time()
        ev_c = ARVRetrievalClip(mdb, spec, extractor(), check_completeness=False)
        rc = ev_c.evaluation()
        report["clip_s"] = round(time.time() - t0, 2)
        report["clip_ap"] = round(float(rc["ap"]), 6)
        report["clip_phases_s"] = phases(ev_c)
        print(f"CLIP     full-scale: {report['clip_s']:.1f}s  ap={rc['ap']:.4f}", flush=True)
        print(f"CLIP phases: {report['clip_phases_s']}", flush=True)

    if "moment" in run and not args.skip_moment:
        t0 = time.time()
        ev = ARVRetrievalMoment(
            mdb,
            spec,
            extractor(),
            workers=os.cpu_count() or 8,
            engine=args.moment_engine,
            scan_chunks=args.moment_scan_chunks,
        )
        if args.moment_queries:
            ev.queries = ev.queries[: args.moment_queries]
        rm = ev.evaluation()
        report["moment_s"] = round(time.time() - t0, 2)
        report["moment_queries"] = len(ev.queries)
        report["moment_engine_requested"] = args.moment_engine
        report["moment_engine"] = ev.resolved_engine
        report["moment_scan_chunks"] = ev.scan_chunks
        report["moment_ap"] = round(float(rm["map05"]["ap"]), 6)
        report["moment_phases_s"] = {
            k: round(v, 2) for k, v in sorted(ev.timings.items())
        }
        print(
            f"MOMENT   {len(ev.queries)} queries: {report['moment_s']:.1f}s  "
            f"ap={rm['map05']['ap']:.4f}",
            flush=True,
        )
        print(f"MOMENT phases: {report['moment_phases_s']}", flush=True)

    if args.json_out:
        import json

        # merge into an existing artifact so each phase can run in its own
        # process (fresh relay stream per phase; see --phases)
        merged = {}
        if os.path.isfile(args.json_out) and len(run) < 3:
            with open(args.json_out) as f:
                merged = json.load(f)
        merged.update(report)
        with open(args.json_out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
