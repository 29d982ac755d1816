#!/usr/bin/env python
"""Per-stage cost breakdown of the folded eval trunk on the real TPU.

Times truncated graphs (preprocess -> stem -> layerK) with a scalar readback
(so readback transfer through the slow relay never pollutes the timing).
Stage cost = difference of successive truncations. Best-of-sweeps.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = 32
CROP = 112
BATCH = 16


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
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
    from flax import linen as nn

    from vqwild_tpu.core.config import ModelConfig
    from vqwild_tpu.models import build_model, init_model
    from vqwild_tpu.models.fold import fold_trunk_params
    from vqwild_tpu.ops.preprocess import normalize_clips_yuv420

    model = build_model(ModelConfig(method="baseline", nclass=200, compute_dtype="bfloat16"))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state_vars = init_model(model, jax.random.PRNGKey(0), (1, 2, CROP, CROP, 3))
        folded = fold_trunk_params(params["trunk"], state_vars["batch_stats"]["trunk"])
    dev = jax.devices()[0]
    fp = jax.device_put(jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), folded), dev)

    DT = jnp.bfloat16

    def conv_apply(p, x, strides, padding):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(DT), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["bias"].astype(DT)

    def block_apply(pblk, x, planes, stride, proj):
        pad1 = ((1, 1), (1, 1))
        y = nn.relu(conv_apply(pblk["conv1"], x, (stride, stride), pad1))
        y = conv_apply(pblk["conv2"], y, (1, 1), pad1)
        r = x
        if proj:
            r = conv_apply(pblk["downsample_conv"], x, (stride, stride), ((0, 0), (0, 0)))
        return nn.relu(y + r)

    def make_trunc(n_layers):
        # n_layers: 0 = preprocess+stem+pool only; 1..4 = through layerN
        def f(y_u8, uv_u8):
            clips = normalize_clips_yuv420(y_u8, uv_u8, out_dtype=DT)
            b, t = clips.shape[0], clips.shape[1]
            x = clips.reshape((b * t,) + clips.shape[2:])
            x = conv_apply(fp["conv1"], x, (2, 2), ((3, 3), (3, 3)))
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            inplanes = 64
            for li, planes in enumerate((64, 128, 256, 512)[:n_layers], start=1):
                for bi in range(2):
                    stride = 2 if (li > 1 and bi == 0) else 1
                    x = block_apply(
                        fp[f"layer{li}_{bi}"], x, planes, stride,
                        proj=(stride != 1 or inplanes != planes),
                    )
                    inplanes = planes
            return jnp.mean(x.astype(jnp.float32))

        return jax.jit(f)

    def make_pre_only():
        def f(y_u8, uv_u8):
            clips = normalize_clips_yuv420(y_u8, uv_u8, out_dtype=DT)
            return jnp.mean(clips.astype(jnp.float32))

        return jax.jit(f)

    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 255, (BATCH, FRAMES, CROP, CROP), dtype=np.uint8), dev)
    uv = jax.device_put(
        rng.integers(0, 255, (BATCH, FRAMES, CROP // 2, CROP // 2, 2), dtype=np.uint8), dev
    )

    stages = [("pre", make_pre_only())] + [
        (f"thru{k}", make_trunc(k)) for k in range(0, 5)
    ]
    times = {}
    for name, f in stages:
        t0 = time.time()
        np.asarray(f(y, uv))
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        best = 1e9
        reps = 24
        for sweep in range(5):
            t0 = time.time()
            r = None
            for _ in range(reps):
                r = f(y, uv)
            np.asarray(r)
            dt = (time.time() - t0) / reps
            best = min(best, dt)
        times[name] = best
        log(f"  {name}: {best*1000:.2f} ms/step best")

    order = ["pre", "thru0", "thru1", "thru2", "thru3", "thru4"]
    prev = 0.0
    log("--- stage deltas ---")
    for name in order:
        d = times[name] - prev
        log(f"{name}: cum {times[name]*1000:.2f} ms, delta {d*1000:.2f} ms")
        prev = times[name]
    print({k: round(v * 1000, 2) for k, v in times.items()})


if __name__ == "__main__":
    main()
