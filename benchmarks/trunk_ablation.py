#!/usr/bin/env python
"""Device-resident trunk throughput ablation on the real TPU.

Variants of the production embedding graph (yuv420 wire -> normalize ->
trunk -> l2-norm), pipelined dispatch with one trailing readback, max of
sweeps (the axon relay's timing quirks: block_until_ready does not block;
per-dispatch overhead ~35 ms).

Usage: python benchmarks/trunk_ablation.py [variant ...]
Variants: full, folded, folded_s2d, fused; each at batch sizes 16 and 64.
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

    from vqwild_tpu.core.config import ModelConfig
    from vqwild_tpu.models import build_model, init_model
    from vqwild_tpu.models.fold import make_folded_trunk
    from vqwild_tpu.ops.preprocess import normalize_clips_yuv420

    model = build_model(
        ModelConfig(method="baseline", nclass=200, compute_dtype="bfloat16")
    )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state_vars = init_model(model, jax.random.PRNGKey(0), (1, 2, CROP, CROP, 3))
    variables = {"params": params, **state_vars}

    def head(fe):
        fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-12)
        return jnp.transpose(fe, (0, 2, 1))

    def build(variant):
        from vqwild_tpu.models.fold import make_folded_trunk, yuv420_center_s2d

        if variant == "fused":
            with jax.default_device(cpu):
                im, iv = make_folded_trunk(
                    variables, dtype=jnp.bfloat16, stem_mode="yuv_s2d"
                )
            iv = jax.device_put(iv, jax.devices()[0])

            def f(y, uv):
                x = yuv420_center_s2d(y, uv, jnp.bfloat16)
                return head(im.apply(iv, x))

            return jax.jit(f)
        if variant == "pallas_stem":
            # exactly the production wiring (fold.make_embed_fn owns the
            # skip-stem/param-split plumbing); fold on CPU for fast setup
            from vqwild_tpu.models.fold import make_embed_fn

            with jax.default_device(cpu):
                f = make_embed_fn(
                    variables,
                    dtype=jnp.bfloat16,
                    stem_mode="yuv_s2d",
                    stem_impl="pallas",
                )
            return jax.jit(f)
        if variant == "full":
            v = jax.device_put(variables, jax.devices()[0])

            def f(y, uv):
                clips = normalize_clips_yuv420(y, uv, out_dtype=jnp.bfloat16)
                return head(model.apply(v, clips, train=False).frame_embed)

        else:
            with jax.default_device(cpu):
                im, iv = make_folded_trunk(
                    variables,
                    dtype=jnp.bfloat16,
                    stem_mode="s2d" if variant == "folded_s2d" else "conv7",
                )
            iv = jax.device_put(iv, jax.devices()[0])

            def f(y, uv):
                clips = normalize_clips_yuv420(y, uv, out_dtype=jnp.bfloat16)
                return head(im.apply(iv, clips))

        return jax.jit(f)

    variants = sys.argv[1:] or ["full", "folded", "folded_s2d"]
    rng = np.random.default_rng(0)
    results = {}
    for variant in variants:
        f = build(variant)
        for batch in (16, 64):
            y = rng.integers(0, 255, (batch, FRAMES, CROP, CROP), dtype=np.uint8)
            uv = rng.integers(0, 255, (batch, FRAMES, CROP // 2, CROP // 2, 2), dtype=np.uint8)
            dy, duv = jax.device_put(y), jax.device_put(uv)
            t0 = time.time()
            np.asarray(f(dy, duv))
            log(f"{variant} b{batch}: compile+first {time.time()-t0:.1f}s")
            # sync via a tiny slice readback: full-output readback through the
            # 10-30 MB/s relay would dominate the timing
            best = 0.0
            reps = max(8, 512 // batch)
            for sweep in range(4):
                t0 = time.time()
                r = None
                for _ in range(reps):
                    r = f(dy, duv)
                np.asarray(r[0, :2, 0])
                dt = time.time() - t0
                cps = batch * reps / dt
                best = max(best, cps)
                log(f"  {variant} b{batch} sweep{sweep}: {cps:.1f} clips/s ({dt/reps*1000:.2f} ms/step)")
            results[f"{variant}_b{batch}"] = round(best, 1)
    print(results)


if __name__ == "__main__":
    main()
