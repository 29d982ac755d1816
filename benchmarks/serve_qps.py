#!/usr/bin/env python
"""Query-serving QPS / latency on the real TPU.

Drives serve.QueryService (micro-batcher + device ranking) with concurrent
client threads issuing feature queries against a production-size gallery,
and reports sustained QPS and p50/p99 latency for several concurrency
levels. Run on the TPU host:
`python benchmarks/serve_qps.py [gallery_n] [--json_out PATH]`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("gallery_n", nargs="?", type=int, default=100_000)
    ap.add_argument("--json_out", default="", help="write the measured numbers")
    args = ap.parse_args()

    from vqwild_tpu.core.hostsig import host_cpu_signature

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".jax_cache", f"host-{host_cpu_signature()}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vqwild_tpu.serve.index import GalleryIndex
    from vqwild_tpu.serve.service import QueryService

    n = args.gallery_n
    c = 512
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    meta = [{"video_id": f"v{i}", "label": "x", "retrieval_type": "base"}
            for i in range(n)]
    index = GalleryIndex(feats, meta)
    log(f"gallery: {n}x{c} on {jax.devices()[0].device_kind}")

    qfeats = rng.normal(size=(4096, c)).astype(np.float32)

    # warm every batch bucket the micro-batcher can produce (compiles once
    # per power-of-two shape; see serve.index._masked_topk)
    for b in (1, 2, 4, 8, 16, 32):
        index.topk(qfeats[:b], k=30)
    log("buckets warm")

    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "gallery_n": n,
        "feat_dim": c,
        "k": 30,
        "levels": [],
    }
    for conc in (1, 8, 32):
        svc = QueryService(index, max_batch=32, max_wait_ms=2.0)
        lat: list = []
        lock = threading.Lock()
        stop = time.monotonic() + 10.0

        def client(ci):
            mine = []
            i = ci
            while time.monotonic() < stop:
                t0 = time.monotonic()
                svc.query_features(qfeats[i % len(qfeats)], k=30)
                mine.append(time.monotonic() - t0)
                i += conc
            with lock:
                lat.extend(mine)

        svc.query_features(qfeats[0], k=30)  # service warm
        stop = time.monotonic() + 10.0       # window starts after warm-up
        threads = [threading.Thread(target=client, args=(ci,)) for ci in range(conc)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.monotonic() - t0
        svc.close()
        if not lat:
            log(f"conc={conc:3d}: no queries completed")
            continue
        lat.sort()
        level = {
            "concurrency": conc,
            "qps": round(len(lat) / dt, 1),
            "p50_ms": round(lat[len(lat) // 2] * 1000, 2),
            "p99_ms": round(lat[int(len(lat) * 0.99)] * 1000, 2),
            "queries": len(lat),
        }
        report["levels"].append(level)
        log(
            f"conc={conc:3d}: {level['qps']:8.1f} qps  "
            f"p50={level['p50_ms']:6.1f} ms  "
            f"p99={level['p99_ms']:6.1f} ms"
        )

    # moment serving: score all windows -> candidate-pool top-k -> per-video
    # temporal NMS (serve/index.py::MomentIndex.query)
    from vqwild_tpu.serve.index import MomentIndex

    n_videos = n // 300  # ~300 multi-duration windows per untrimmed video
    vidx = rng.integers(0, n_videos, n)
    starts = rng.uniform(0, 100, n)
    midx = MomentIndex(
        feats, [f"u{i}" for i in range(n_videos)], vidx, starts,
        starts + rng.uniform(3, 120, n),
    )
    midx.query(qfeats[:1], k=10)  # warm
    mlat = []
    for i in range(30):
        t0 = time.monotonic()
        midx.query(qfeats[i : i + 1], k=10)
        mlat.append(time.monotonic() - t0)
    mlat.sort()
    report["moment"] = {
        "windows": n,
        "videos": n_videos,
        "k": 10,
        "p50_ms": round(mlat[len(mlat) // 2] * 1000, 2),
    }
    log(
        f"moment query ({n} windows / {n_videos} videos, k=10 + NMS): "
        f"p50={report['moment']['p50_ms']:6.1f} ms"
    )

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
        log(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
