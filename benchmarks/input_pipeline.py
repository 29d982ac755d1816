#!/usr/bin/env python
"""Host input-pipeline throughput at production train shapes (SURVEY §7 #1).

The reference's known bottleneck is CPU JPEG decode: 96 frame reads per
triplet in DataLoader workers (dataloader_baseline.py:241-249, main.py:343).
This benchmark measures whether OUR host pipeline (data/triplets.py) can
sustain the chip's training rate, per frame store and worker count:

  loader   PrefetchLoader alone: sustained clips/s producing cropped uint8
           batches (10 triplets = 30 clips x 32 frames x 112^2), per store
           (jpeg / packed_rgb / packed_yuv) and worker count.
  step     device-resident vasa train-step rate (the consumer's ceiling).
  e2e      loader feeding the real train step with one-batch device_put
           pipelining — sustained end-to-end clips/s and the achieved
           overlap vs min(loader, step).

The dataset is generated once into --data_dir: 200 classes x 2 videos with
realistic frame counts (48-192 at 171x128 fps3 geometry) and smooth
procedural content so JPEG size/decode cost matches ActivityNet's ~4-8 KB
frames; then packed into the RGB and YUV 4:2:0 blob formats with the
production converters (data/frames.py).

Each phase prints one JSON line; --json_out merges phases into one artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NCLASS = 200
VIDS_PER_CLASS = 2
FRAME_H, FRAME_W = 128, 171
FPS = 3
BATCH = 10  # triplets -> 30 clips
FRAMES = 32
CROP = 112


def log(m):
    print(m, file=sys.stderr, flush=True)


def _video_frames(rng):
    return int(rng.integers(48, 193))


def _render_video(rng, n, cls):
    """Smooth moving-gradient content: compresses to ActivityNet-like JPEG
    sizes (a few KB) so decode cost is representative, unlike noise."""
    t = np.arange(n, dtype=np.float32)[:, None, None]
    yy = np.linspace(0, np.pi * 2, FRAME_H, dtype=np.float32)[None, :, None]
    xx = np.linspace(0, np.pi * 2, FRAME_W, dtype=np.float32)[None, None, :]
    phase = rng.uniform(0, np.pi * 2)
    freq = 0.5 + (cls % 17) * 0.15
    base = np.sin(yy * freq + t * 0.21 + phase) + np.cos(xx * freq - t * 0.13)
    img = ((base + 2.0) * 63.0).astype(np.uint8)
    frames = np.stack(
        [img, np.roll(img, cls % 7, axis=2), np.roll(img, -(cls % 5), axis=1)],
        axis=-1,
    )
    return frames  # [n, H, W, 3] u8


def build_dataset(data_dir: str) -> str:
    """Generate JPEG tree + packed stores + DB/spec JSONs. Idempotent."""
    marker = os.path.join(data_dir, ".complete")
    if os.path.exists(marker):
        return data_dir
    from PIL import Image

    from vqwild_tpu.data.frames import PackedFrameStore, PackedYUV420FrameStore

    rng = np.random.default_rng(0)
    jpeg_root = os.path.join(data_dir, "jpeg")
    db = {"training": {}, "validation": {}, "testing": {}}
    t0 = time.time()
    for cls in range(NCLASS):
        label = f"class_{cls:03d}"
        recs = []
        for vi in range(VIDS_PER_CLASS):
            vid = f"ip{cls:03d}_{vi}"
            n = _video_frames(rng)
            frames = _render_video(rng, n, cls)
            vd = os.path.join(jpeg_root, "training", vid)
            os.makedirs(vd, exist_ok=True)
            for fi in range(n):
                Image.fromarray(frames[fi]).save(
                    os.path.join(vd, f"image_{fi + 1:05d}.jpg"), quality=87
                )
            dur = n / FPS
            recs.append(
                dict(
                    video_id=vid,
                    label=label,
                    segment=[0.0, dur],
                    border=[0.0, dur],
                    activitynet_subset="training",
                    activitynet_duration=dur,
                    is_query=0,
                    retrieval_type="base",
                )
            )
        db["training"][label] = recs
    log(f"jpeg tree built in {time.time() - t0:.0f}s")
    with open(os.path.join(data_dir, "arv_db_ipipe.json"), "w") as f:
        json.dump(db, f)

    from vqwild_tpu.data.frames import JpegDirFrameStore

    t0 = time.time()
    PackedFrameStore.pack_from_jpeg(
        jpeg_root, os.path.join(data_dir, "packed_rgb"), subsets=("training",)
    )
    PackedYUV420FrameStore.pack_from_store(
        JpegDirFrameStore(jpeg_root),
        os.path.join(data_dir, "packed_yuv"),
        subsets=("training",),
        jpeg_root=jpeg_root,
    )
    log(f"packed stores built in {time.time() - t0:.0f}s")
    with open(marker, "w") as f:
        f.write("ok")
    return data_dir


def _spec(data_dir):
    from vqwild_tpu.data.labels import SplitSpec

    return SplitSpec(
        name="ipipe",
        train_labels=tuple(f"class_{c:03d}" for c in range(NCLASS)),
        val_labels=(),
        test_labels=(),
        db_json=os.path.join(data_dir, "arv_db_ipipe.json"),
        moment_db_json="",
    )


def _store(data_dir, kind):
    from vqwild_tpu.data.frames import (
        JpegDirFrameStore,
        PackedFrameStore,
        PackedYUV420FrameStore,
    )

    if kind == "jpeg":
        return JpegDirFrameStore(os.path.join(data_dir, "jpeg"))
    if kind == "packed_rgb":
        return PackedFrameStore(os.path.join(data_dir, "packed_rgb"))
    if kind == "packed_yuv":
        return PackedYUV420FrameStore(os.path.join(data_dir, "packed_yuv"))
    raise ValueError(kind)


def _dataset(data_dir, kind, wire):
    from vqwild_tpu.data.schema import load_trimmed_db
    from vqwild_tpu.data.triplets import TripletDataset

    db = load_trimmed_db(os.path.join(data_dir, "arv_db_ipipe.json"))
    return TripletDataset(
        db,
        _spec(data_dir),
        _store(data_dir, kind),
        train_frames=FRAMES,
        crop_size=CROP,
        nclass=NCLASS,
        wire=wire,
    )


def bench_loader(data_dir, kind, wire, workers, batches, warmup=8):
    from vqwild_tpu.data.triplets import PrefetchLoader

    ds = _dataset(data_dir, kind, wire)
    loader = PrefetchLoader(
        ds, BATCH, steps_per_epoch=batches + warmup, workers=workers, prefetch=8
    )
    it = loader.epoch(0)
    nbytes = 0
    for i, b in enumerate(it):
        if i == warmup - 1:
            t0 = time.perf_counter()
            nbytes = sum(a.nbytes for a in b.arrays)
        pass
    dt = time.perf_counter() - t0
    rate = batches * BATCH * 3 / dt
    return dict(
        store=kind,
        wire=wire,
        workers=workers,
        clips_per_s=round(rate, 1),
        batch_mb=round(nbytes / 1e6, 2),
    )


def _train_step_setup():
    import jax
    import jax.numpy as jnp

    from vqwild_tpu.core.config import ModelConfig
    from vqwild_tpu.core.hostsig import host_cpu_signature
    from vqwild_tpu.models import build_model, init_model
    from vqwild_tpu.train.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".jax_cache", f"host-{host_cpu_signature()}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model = build_model(
        ModelConfig(method="vasa", nclass=NCLASS, compute_dtype="bfloat16",
                    semantic_dim=300)
    )
    rng = jax.random.PRNGKey(0)
    params, state_vars = init_model(model, rng, (1, 2, CROP, CROP, 3))
    tx = make_optimizer(1e-4, 1e-5, steps_per_epoch=100, lr_decay_epoch=9)
    state = create_train_state(model, params, state_vars, tx, rng)
    sem = jnp.asarray(np.random.default_rng(0).standard_normal(
        (NCLASS, 300), dtype=np.float32))
    step = make_train_step(model, tx, semantic_memory=sem, wire="yuv420")
    return jax, state, step


def _fake_batch():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 255, (BATCH * 3, FRAMES, CROP, CROP), dtype=np.uint8)
    uv = rng.integers(0, 255, (BATCH * 3, FRAMES, CROP // 2, CROP // 2, 2),
                      dtype=np.uint8)
    labels = rng.integers(0, NCLASS, BATCH * 3).astype(np.int32)
    return y, uv, labels


def bench_step(iters=30):
    jax, state, step = _train_step_setup()
    y, uv, labels = (jax.device_put(a) for a in _fake_batch())
    state, metrics = step(state, y, uv, labels)
    _ = float(np.asarray(metrics["loss"]))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, y, uv, labels)
    _ = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    return dict(
        step_ms=round(dt / iters * 1e3, 2),
        device_clips_per_s=round(iters * BATCH * 3 / dt, 1),
    )


def bench_e2e(data_dir, kind, workers, batches, warmup=6):
    import jax

    from vqwild_tpu.data.triplets import PrefetchLoader

    jaxm, state, step = _train_step_setup()
    ds = _dataset(data_dir, kind, "yuv420")
    loader = PrefetchLoader(
        ds, BATCH, steps_per_epoch=batches + warmup, workers=workers, prefetch=8
    )
    pending = None
    t0 = None
    metrics = None
    done = 0
    for i, b in enumerate(loader.epoch(0)):
        dev = tuple(jax.device_put(a) for a in (*b.arrays, b.labels))
        if pending is not None:  # one-batch pipelining: upload next, step prev
            state, metrics = step(state, *pending)
            done += 1
        pending = dev
        if i == warmup - 1:
            _ = float(np.asarray(metrics["loss"]))  # settle the pipe
            t0 = time.perf_counter()
            done = 0
    state, metrics = step(state, *pending)
    done += 1
    _ = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    return dict(
        store=kind,
        workers=workers,
        e2e_clips_per_s=round(done * BATCH * 3 / dt, 1),
        steps=done,
    )


def main():
    global NCLASS
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=os.path.join(REPO, "benchmarks",
                                                      ".ipipe_data"))
    p.add_argument("--phases", default="loader,step,e2e")
    p.add_argument("--workers", default="2,4,8,16")
    p.add_argument("--stores", default="jpeg,packed_rgb,packed_yuv")
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--platform", default="")
    p.add_argument("--json_out", default="")
    p.add_argument("--nclass", type=int, default=NCLASS,
                   help="smoke-test knob; the dataset dir is nclass-specific")
    args = p.parse_args()

    NCLASS = args.nclass
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    build_dataset(args.data_dir)
    phases = args.phases.split(",")
    workers = [int(w) for w in args.workers.split(",")]
    from vqwild_tpu.core.hostsig import host_cpu_signature

    report = {"batch_clips": BATCH * 3, "frames": FRAMES, "crop": CROP,
              "host_cpus": os.cpu_count(),
              "host_cpu_signature": host_cpu_signature(),
              "batches": args.batches}

    if "loader" in phases:
        rows = []
        for kind in args.stores.split(","):
            wire = "yuv420"
            for w in workers:
                r = bench_loader(args.data_dir, kind, wire, w, args.batches)
                log(f"loader {r}")
                rows.append(r)
        report["loader"] = rows
    if "step" in phases:
        report["step"] = bench_step()
        log(f"step {report['step']}")
    if "e2e" in phases:
        # loader/step rows may come from an earlier process's artifact
        if args.json_out and os.path.isfile(args.json_out):
            with open(args.json_out) as f:
                prior = json.load(f)
            for k in ("loader", "step"):
                if k not in report and k in prior:
                    report[k] = prior[k]
        rows = []
        best_w = max(workers)
        for kind in args.stores.split(","):
            r = bench_e2e(args.data_dir, kind, best_w, args.batches)
            log(f"e2e {r}")
            rows.append(r)
        report["e2e"] = rows
        if "step" in report:
            dev = report["step"]["device_clips_per_s"]
            for r in rows:
                loader_rate = max(
                    (
                        lr["clips_per_s"]
                        for lr in report.get("loader", [])
                        if lr["store"] == r["store"]
                    ),
                    default=None,
                )
                if loader_rate:
                    r["overlap_pct"] = round(
                        100 * r["e2e_clips_per_s"] / min(loader_rate, dev), 1
                    )
    print(json.dumps(report))
    if args.json_out:
        # merge into an existing artifact so each phase can run in its own
        # process (the TPU phases ride the relay; loader is host-only)
        merged = {}
        if os.path.isfile(args.json_out):
            with open(args.json_out) as f:
                merged = json.load(f)
        merged.update(report)
        with open(args.json_out, "w") as f:
            json.dump(merged, f, indent=1)
        log(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
