"""Windowed temporal pooling over long-video feature tapes.

The untrimmed evaluators score every clip window / moment as the *mean* of the
per-frame feature tape over the window (dataloader_baseline.py:819-823,
:1139-1144 — upstream slices and means per window in Python). On device this
is a cumulative sum along time followed by two gathers per window:

    mean[a:b) = (cumsum[b] − cumsum[a]) / (b − a)

which turns the O(windows × window_len) pooling into O(T + windows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def window_mean_from_cumsum(cum, starts, ends):
    """cum [T+1, C] (leading zero row); starts/ends [W] → [W, C] means.

    Windows are half-open [start, end), end > start.
    """
    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    total = cum[ends] - cum[starts]
    return total / jnp.maximum(ends - starts, 1)[:, None].astype(cum.dtype)


@jax.jit
def sliding_window_mean(tape, starts, ends):
    """tape [T, C] per-frame features; starts/ends [W] → [W, C] window means."""
    cum = jnp.concatenate(
        [jnp.zeros((1, tape.shape[1]), tape.dtype), jnp.cumsum(tape, axis=0)], axis=0
    )
    return window_mean_from_cumsum(cum, starts, ends)


def enumerate_clip_windows(
    duration_sec: float,
    feat_len: int,
    clip_sec: int,
    fps: int,
    temporal_stride: int,
):
    """Non-overlapping clip windows (ARV_Retrieval_Clip.garner_feat,
    dataloader_baseline.py:807-818): starts every clip_sec seconds from 0,
    window [t, t+clip_sec) seconds → feature frames [t·fps/stride,
    (t+clip_sec)·fps/stride), skipped when exceeding the tape.

    Returns (starts, ends, loc_secs) as numpy arrays.
    """
    starts, ends, locs = [], [], []
    for clip_start in range(0, int(duration_sec), clip_sec):
        f0 = clip_start * fps // temporal_stride
        f1 = (clip_start + clip_sec) * fps // temporal_stride
        if f1 > feat_len:
            continue
        starts.append(f0)
        ends.append(f1)
        locs.append((clip_start, clip_start + clip_sec))
    return (
        np.asarray(starts, np.int32),
        np.asarray(ends, np.int32),
        np.asarray(locs, np.float64).reshape(-1, 2),
    )


def enumerate_moment_windows(
    duration_sec: float,
    feat_len: int,
    clip_sec: int,
    max_clips: int,
    fps: int,
    temporal_stride: int,
):
    """Variable-length moment windows (ARV_Retrieval_Moment.garner_feat,
    dataloader_baseline.py:1117-1151): for n in 1..max_clips, starts every
    clip_sec seconds in range(0, int(duration) − clip_sec·n), window length
    clip_sec·n seconds; skipped when the feature window exceeds the tape.

    Note upstream's ``range`` bound excludes a start exactly at
    duration − length (python range semantics) — preserved.
    """
    starts, ends, locs = [], [], []
    for n in range(1, max_clips + 1):
        length = clip_sec * n
        for t0 in range(0, int(duration_sec) - length, clip_sec):
            f0 = t0 * fps // temporal_stride
            f1 = (t0 + length) * fps // temporal_stride
            if f1 > feat_len:
                continue
            starts.append(f0)
            ends.append(f1)
            locs.append((t0, t0 + length))
    return (
        np.asarray(starts, np.int32),
        np.asarray(ends, np.int32),
        np.asarray(locs, np.float64).reshape(-1, 2),
    )
