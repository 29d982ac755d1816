"""Post-training int8 quantization of the folded serving trunk.

The MXU runs int8 matmuls at ~2x the bf16 rate (v5e: 394 vs 197 TOPS), and
the BN-folded eval trunk (models/fold.py) is a pure conv/relu/add pipeline —
ideal PTQ territory. This module quantizes that trunk for *serving only*
(feature extraction / gallery builds); training and the reference-parity
eval path stay float. Measured on v5e: 3.6k -> 4.8k clips/s device-resident
(~1.33x; 1.50x if the params are folded in as jit constants, at the cost
of a recompile per calibration) at >0.98 embedding cosine vs the float
trunk on natural-statistics inputs.

Scheme (correction-free, zero-point 0 everywhere):
* weights: symmetric per-output-channel int8; the conv's per-input-channel
  activation scale is folded into the weight *before* quantization.
* activations: symmetric per-tensor scales. Every conv input in the folded
  trunk is post-ReLU (non-negative), so symmetric quant spends its range on
  [0, 127] — 7 effective bits, which keeps zero-padding at the conv borders
  exactly representable (no zero-point correction terms, no special padding).
* the stem input is the centered YUV420 space-to-depth feed
  (fold.yuv420_center_s2d): an integer uint8 grid minus a static zero point.
  Its scales are computed from the *static* [0,255] range — no calibration —
  and the quantization error is <= 0.55 of one uint8 step, the same order as
  JPEG rounding.
* between convs: dequantize to fp32 (one fused multiply-add per element),
  relu/residual-add in fp32, requantize to int8 at the next conv's
  calibrated scale. The 3x3 maxpool runs directly on int8 (max commutes
  with monotone quantization).

Calibration is one (or a few) representative batches through a float shadow
of the same graph, recording per-tensor maxima (``calibrate_trunk``).

Replaces: the reference has no quantized path (torch fp32 on CUDA,
models/resnet18_3d_f2f.py); this is a TPU-serving capability beyond parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.models.fold import (
    YUV_ZERO_CB,
    YUV_ZERO_CR,
    YUV_ZERO_Y,
    make_folded_trunk,
)

_STAGES = ((1, 64), (2, 128), (3, 256), (4, 512))

_CALIB_FORMAT = "vqwild-int8-calib-v1"


def save_calibration(path: str, calib: Dict[str, float]) -> None:
    """Persist calibration maxima as JSON (atomic rename).

    Calibration is otherwise ephemeral first-batch closure state: two
    serving processes (or a restart) would calibrate on different batches
    and embed the SAME checkpoint slightly differently — a gallery built by
    one process then disagrees with the queries of another. Persisting the
    scales next to the checkpoint pins the quantized program's numerics.
    """
    import json
    import os

    # unique tmp per writer: concurrent first-time calibrators (the very
    # multi-process scenario persistence exists for) must not interleave
    # writes into one shared tmp file before the atomic publish. uuid, not
    # pid: two containerized hosts writing to a shared filesystem are
    # commonly both pid 1
    import uuid

    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump({"format": _CALIB_FORMAT, "maxima": calib}, f, indent=1)
    os.replace(tmp, path)


def load_calibration(path: str) -> Dict[str, float]:
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _CALIB_FORMAT:
        raise ValueError(f"{path}: not a {_CALIB_FORMAT} file")
    return {k: float(v) for k, v in payload["maxima"].items()}


def checkpoint_fingerprint(test_load: str) -> str:
    """10-hex identity of a checkpoint's weights: path + per-file
    mtime/size. Derived artifacts living beside/inside the checkpoint
    (int8_calib*.json) are excluded so writing them does not change the
    fingerprint of the weights they were derived from.

    Shared by every process that evaluates or serves a checkpoint (eval
    CLI cache tags, serve calibration discovery) — they must agree on the
    identity or they disagree on the artifacts."""
    import hashlib
    import os

    p = os.path.abspath(test_load)
    h = hashlib.sha256(p.encode())
    try:
        if os.path.isdir(p):
            for root, _, files in sorted(os.walk(p)):
                for fn in sorted(files):
                    # substring, not prefix: a file checkpoint inside this
                    # directory gets sibling <file>.int8_calib-<fp>.json
                    # artifacts, which must not churn the dir fingerprint
                    if "int8_calib" in fn:
                        continue
                    st = os.stat(os.path.join(root, fn))
                    h.update(f"{fn}:{st.st_mtime_ns}:{st.st_size}".encode())
        else:
            st = os.stat(p)
            h.update(f"{st.st_mtime_ns}:{st.st_size}".encode())
    except OSError:
        pass
    return h.hexdigest()[:10]


def calibration_path(test_load: str):
    """Where a checkpoint's int8 calibration scales persist
    (save_calibration): beside the checkpoint, so every process serving or
    evaluating it quantizes with identical numerics. The filename embeds
    the checkpoint's weight fingerprint — overwriting a checkpoint in
    place (retrain to the same path) must not silently reuse scales
    calibrated on the old weights' activation ranges.

    Migration: if the fingerprinted file does not exist but a legacy
    unfingerprinted ``int8_calib.json`` does AND is at least as new as the
    checkpoint's weights, the legacy path is returned — a fleet whose
    gallery was embedded with the old scales must keep loading them, not
    recalibrate on an arbitrary new batch and disagree with its own
    gallery. A legacy file *older* than the weights was calibrated on a
    previous checkpoint that was since overwritten in place — exactly the
    stale-scales bug fingerprinting exists to prevent — so it is rejected
    and the fingerprinted path is returned for a fresh calibration.
    (Readers load whatever this returns; writers only run when the file is
    absent, so new calibrations always get the fingerprinted name.)"""
    import os

    if not test_load:
        return None
    p = os.path.abspath(test_load)
    fp = checkpoint_fingerprint(test_load)
    if os.path.isdir(p):
        path = os.path.join(p, f"int8_calib-{fp}.json")
        legacy = os.path.join(p, "int8_calib.json")
    else:
        path = f"{p}.int8_calib-{fp}.json"
        legacy = f"{p}.int8_calib.json"
    if not os.path.exists(path) and os.path.exists(legacy):
        from vqwild_tpu.core.logging import get_logger

        log = get_logger("models.quant")
        try:
            legacy_mtime = os.stat(legacy).st_mtime_ns
        except OSError:
            legacy_mtime = -1
        if legacy_mtime >= _checkpoint_mtime_ns(p):
            log.warning(
                "int8 calibration: using legacy unfingerprinted %s "
                "(predates fingerprinted scheme); next calibration writes %s",
                legacy,
                os.path.basename(path),
            )
            return legacy
        log.warning(
            "int8 calibration: ignoring legacy %s — older than the "
            "checkpoint weights (retrained in place?); recalibrating to %s",
            legacy,
            os.path.basename(path),
        )
    return path


def _checkpoint_mtime_ns(p: str) -> int:
    """Newest weight-file mtime of a checkpoint path (calibration artifacts
    excluded — they derive from the weights, they don't date them)."""
    import os

    newest = 0
    try:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for fn in files:
                    if "int8_calib" in fn:
                        continue
                    newest = max(newest, os.stat(os.path.join(root, fn)).st_mtime_ns)
        else:
            newest = os.stat(p).st_mtime_ns
    except OSError:
        pass
    return newest


def _stem_input_scales() -> np.ndarray:
    """Static per-channel scales of the centered YUV s2d feed (6 channels).

    Channel c spans [lo_c - z_c, hi_c - z_c] for the u8 range [0, 255]; the
    symmetric scale is max(|lo|, |hi|)/127.
    """
    zeros = np.array(
        [YUV_ZERO_Y] * 4 + [128.0 + YUV_ZERO_CB, 128.0 + YUV_ZERO_CR], np.float32
    )
    hi = np.maximum(np.abs(0.0 - zeros), np.abs(255.0 - zeros))
    return (hi / 127.0).astype(np.float32)


def _quant_weight(kernel: np.ndarray, in_scales: Optional[np.ndarray]):
    """HWIO fp32 kernel (+ optional per-input-channel activation scale folded
    in) → (int8 kernel, fp32 per-output-channel scale)."""
    k = np.asarray(kernel, np.float32)
    if in_scales is not None:
        k = k * in_scales[None, None, :, None]
    amax = np.abs(k).max(axis=(0, 1, 2))
    sw = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.rint(k / sw[None, None, None, :]), -127, 127).astype(np.int8)
    return q, sw


def _center_s2d_int8(y_u8, uv_u8, scales: np.ndarray):
    """uint8 planes → int8 [N, H/2, W/2, 6] stem feed: the float centered
    feed (fold.yuv420_center_s2d — single source of the s2d layout and zero
    points) on the uint8 grid, divided by the static per-channel scales."""
    from vqwild_tpu.models.fold import yuv420_center_s2d

    x = yuv420_center_s2d(y_u8, uv_u8, jnp.float32)
    q = jnp.round(x / jnp.asarray(scales))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _iconv(x_i8, k_i8, strides, padding):
    return jax.lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _maxpool_i8(x):
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def calibrate_trunk(variables, y_u8, uv_u8, *, bn_eps: float = 1e-3) -> Dict[str, float]:
    """Per-tensor activation maxima from a float shadow of the folded trunk.

    Returns {"stem_out": m, "layer{l}_{b}_mid": m, "layer{l}_{b}_out": m}
    where each m is the max over the calibration batch of the corresponding
    post-ReLU tensor. Accepts [B, T, H, W] planes (T folded into batch).
    """
    from vqwild_tpu.models.fold import yuv420_center_s2d

    model, iv = make_folded_trunk(variables, dtype=jnp.float32, stem_mode="yuv_s2d",
                                  bn_eps=bn_eps)
    p = iv["params"]

    def conv(pp, x, strides, padding):
        y = jax.lax.conv_general_dilated(
            x, pp["kernel"], strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + pp["bias"]

    @jax.jit
    def run(y_in, uv_in):
        x = yuv420_center_s2d(y_in, uv_in, jnp.float32)
        n = x.shape[0] * x.shape[1]
        x = x.reshape((n,) + x.shape[2:])
        maxes = {}
        x = jax.nn.relu(conv(p["conv1"], x, (1, 1), ((2, 1), (2, 1))))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        maxes["stem_out"] = x.max()
        for li, planes in _STAGES:
            for bi in range(2):
                stride = 2 if (li > 1 and bi == 0) else 1
                blk = p[f"layer{li}_{bi}"]
                r = x
                m = jax.nn.relu(conv(blk["conv1"], x, (stride, stride), ((1, 1), (1, 1))))
                maxes[f"layer{li}_{bi}_mid"] = m.max()
                y2 = conv(blk["conv2"], m, (1, 1), ((1, 1), (1, 1)))
                if "downsample_conv" in blk:
                    r = conv(blk["downsample_conv"], x, (stride, stride), ((0, 0), (0, 0)))
                x = jax.nn.relu(y2 + r)
                maxes[f"layer{li}_{bi}_out"] = x.max()
        return maxes

    out = run(jnp.asarray(y_u8), jnp.asarray(uv_u8))
    return {k: float(v) for k, v in out.items()}


def quantize_trunk(variables, calib: Dict[str, float], *, bn_eps: float = 1e-3):
    """Folded-trunk variables + calibration maxima → int8 param pytree.

    Every scale is pre-folded on the host so the device graph is one fused
    multiply-add per conv output (relu commutes with the positive requant
    scale, so relu(deq(y))·1/s == relu(y·m + b) with m, b divided by s):

    {"stem": {kernel i8, m f32[64], b f32[64]},
     "layer{l}_{b}": {conv1: {kernel, m, b},           # m,b → /s_mid
                      conv2: {kernel, m, b},           # m,b → /s_out
                      downsample_conv?: {kernel, m, b},# m,b → /s_out
                      res_scale f32[]},                # s_in/s_out (identity)
     "out_scale": f32[]}                               # final dequant
    """
    _, iv = make_folded_trunk(variables, dtype=jnp.float32, stem_mode="yuv_s2d",
                              bn_eps=bn_eps)
    p = jax.tree_util.tree_map(np.asarray, iv["params"])

    act = {k: np.float32(max(v, 1e-6) / 127.0) for k, v in calib.items()}
    in_scales = _stem_input_scales()
    out: Dict[str, Any] = {}

    def mb(kernel, bias, in_s, s_div):
        kq, sw = _quant_weight(kernel, in_s)
        return {
            "kernel": kq,
            "m": (sw / s_div).astype(np.float32),
            "b": (np.asarray(bias, np.float32) / s_div).astype(np.float32),
        }

    s_stem = act["stem_out"]
    out["stem"] = mb(p["conv1"]["kernel"], p["conv1"]["bias"], in_scales, s_stem)
    prev_out = "stem_out"
    for li, planes in _STAGES:
        for bi in range(2):
            blk = p[f"layer{li}_{bi}"]
            s_in = act[prev_out]
            s_mid = act[f"layer{li}_{bi}_mid"]
            s_out = act[f"layer{li}_{bi}_out"]
            q = {
                # conv1 input is int8 at s_in: fold s_in into m via in-scale
                "conv1": mb(blk["conv1"]["kernel"] * s_in, blk["conv1"]["bias"],
                            None, s_mid),
                "conv2": mb(blk["conv2"]["kernel"] * s_mid, blk["conv2"]["bias"],
                            None, s_out),
                "res_scale": np.float32(s_in / s_out),
            }
            if "downsample_conv" in blk:
                q["downsample_conv"] = mb(
                    blk["downsample_conv"]["kernel"] * s_in,
                    blk["downsample_conv"]["bias"], None, s_out,
                )
            out[f"layer{li}_{bi}"] = q
            prev_out = f"layer{li}_{bi}_out"
    out["out_scale"] = act[prev_out]
    return out


def int8_trunk_apply(qp, y_u8, uv_u8):
    """int8 params + uint8 planes [B, T, ...] → fp32 frame features [B, T, 512].

    Same output contract as fold.ResNet18F2FInfer on the yuv_s2d stem. All
    requant scales were folded into per-channel ``m``/``b`` on the host
    (quantize_trunk), so each conv is followed by exactly one fused
    multiply-add (+relu/round/clip) — no separate dequant/requant passes.
    """
    b, t = y_u8.shape[0], y_u8.shape[1]
    x = _center_s2d_int8(
        y_u8.reshape((b * t,) + y_u8.shape[2:]),
        uv_u8.reshape((b * t,) + uv_u8.shape[2:]),
        _stem_input_scales(),
    )

    def conv_requant_relu(x_i8, cp, strides, padding):
        f = jax.nn.relu(
            _iconv(x_i8, cp["kernel"], strides, padding).astype(jnp.float32)
            * cp["m"] + cp["b"]
        )
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    def conv_affine(x_i8, cp, strides, padding):
        return (
            _iconv(x_i8, cp["kernel"], strides, padding).astype(jnp.float32)
            * cp["m"] + cp["b"]
        )

    x = _maxpool_i8(conv_requant_relu(x, qp["stem"], (1, 1), ((2, 1), (2, 1))))

    for li, planes in _STAGES:
        for bi in range(2):
            stride = 2 if (li > 1 and bi == 0) else 1
            blk = qp[f"layer{li}_{bi}"]
            m = conv_requant_relu(x, blk["conv1"], (stride, stride), ((1, 1), (1, 1)))
            y2 = conv_affine(m, blk["conv2"], (1, 1), ((1, 1), (1, 1)))
            if "downsample_conv" in blk:
                r = conv_affine(x, blk["downsample_conv"], (stride, stride), ((0, 0), (0, 0)))
            else:
                r = x.astype(jnp.float32) * blk["res_scale"]
            f = jax.nn.relu(y2 + r)
            x = jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2)) * qp["out_scale"]
    return feats.reshape(b, t, -1)


def _normalized_embed(qp, y_u8, uv_u8):
    """int8 trunk + the serving epilogue: L2-normalize, [B, C, T] layout."""
    fe = int8_trunk_apply(qp, y_u8, uv_u8)
    fe = fe / jnp.maximum(jnp.linalg.norm(fe, axis=-1, keepdims=True), 1e-12)
    return jnp.transpose(fe, (0, 2, 1))


@jax.jit
def _embed_int8(qp, y_u8, uv_u8):
    """The compiled serving graph. ``qp`` is an ARGUMENT, not a closure
    constant: recalibrating (new checkpoint, new calibration batch) reuses
    this executable instead of triggering a fresh XLA compile — scales and
    int8 kernels are runtime parameters of the same program."""
    return _normalized_embed(qp, y_u8, uv_u8)


def make_int8_embed_fn(variables, calib_planes, *, calib=None, device=None,
                       bn_eps: float = 1e-3, const_params: bool = False):
    """(trained/imported variables, (y_u8, uv_u8) calibration batch) → the
    int8 serving embed fn f(y, uv) -> L2-normalized [B, C, T] fp32 — the
    same contract as fold.make_embed_fn(stem_mode="yuv_s2d"). Already
    jitted (do NOT re-wrap in jax.jit at the call site: that would fold the
    quantized params back into per-calibration constants and recompile for
    every calibration).

    ``calib`` (precomputed calibrate_trunk dict) skips the float-shadow run;
    ``device`` places the quantized params explicitly — since they ride as
    jit *arguments*, their committed device decides where the serving graph
    runs (pass the accelerator when calibration happened under a CPU
    default_device context).

    ``const_params=True`` bakes the quantized params into the executable as
    jit constants instead: measured ~1.13x faster serving dispatch (XLA
    pre-lays-out and constant-folds the weights), at the cost of a full
    recompile per calibration/process — the right trade for long-lived
    serving now that calibration persists on disk (save_calibration), and
    wrong for calibrate-often evaluation. Single-device only, placed on the
    default device: ``device`` must be None in this mode (asserted).
    """
    if calib is None:
        calib = calibrate_trunk(variables, *calib_planes, bn_eps=bn_eps)
    qp = quantize_trunk(variables, calib, bn_eps=bn_eps)

    if const_params:
        # const mode bakes params into the executable on the default
        # device; an explicit placement request cannot be honored here
        assert device is None, "const_params=True places via the default device"
        # keep qp on HOST: jit bakes the constants into the executable at
        # trace time, so a device_put copy held by the closure would leave
        # the whole quantized trunk resident on device twice
        qp_host = jax.tree_util.tree_map(np.asarray, qp)

        @jax.jit
        def _embed_const(y_u8, uv_u8):
            return _normalized_embed(qp_host, y_u8, uv_u8)  # qp → constants

        def f(y_u8, uv_u8):
            return _embed_const(jnp.asarray(y_u8), jnp.asarray(uv_u8))

        return f

    qp = jax.device_put(qp, device) if device is not None else jax.device_put(qp)

    def f(y_u8, uv_u8):
        return _embed_int8(qp, jnp.asarray(y_u8), jnp.asarray(uv_u8))

    return f
