"""Fully-vectorized ranked-retrieval metrics (AP + R@N) on device.

Replaces the reference's per-query Python loop (FAISS full search → dict
shuffling → sklearn average_precision_score, dataloader_baseline.py:1526-1608)
with one batched computation over [Q, G] score matrices:

* ignored candidates (the multi-query source videos, dataloader:1532) are
  pushed to −inf so valid items form a sorted prefix;
* AP follows sklearn's uninterpolated definition *including tie handling*:
  precision is evaluated per distinct-score group at the group's last item,
  and every tp in the group is credited with that group precision;
* the reference's "robust mAP" quirk (dataloader:389,:434) — the last-ranked
  *valid* item is forced to a true positive for AP **but not** for the R@N
  numerator/denominator (it mutates the numpy copy only) — is reproduced;
* R@N = (tp among the first N valid) / (tp among all valid + 1e-10)
  (dataloader:393-401).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def ap_from_sorted(s_sorted, tp_ap, valid, nvalid):
    """sklearn-tie average precision over a score-desc-sorted stream.

    ``s_sorted`` [Q,G] scores sorted descending with invalid items pushed to
    −inf (sorted last); ``tp_ap`` [Q,G] the positive labels *including any
    robust-mAP flip, already masked to valid*; ``valid`` [Q,G] the sorted
    validity mask; ``nvalid`` [Q,1] valid counts. Precision is evaluated per
    distinct-score group at the group's last item and every tp in the group
    is credited with that group precision — identical tie handling to
    sklearn.average_precision_score / ops.metrics_np.average_precision.

    Shared by the score-order evaluators (ranked_retrieval_metrics) and the
    moment engine's grouped-order metrics (retrieval/moment_device.py),
    whose flip element differs.
    """
    q, g = s_sorted.shape
    idx = jnp.arange(g)[None, :]
    npos_ap = jnp.sum(tp_ap, axis=1, keepdims=True)
    cum_tp = jnp.cumsum(tp_ap, axis=1)
    cnt = idx + 1  # within the valid prefix, count == position+1
    precision = cum_tp / cnt
    # distinct-score group boundaries (last item of each tie group)
    nxt = jnp.concatenate(
        [s_sorted[:, 1:], jnp.full((q, 1), -jnp.inf, s_sorted.dtype)], axis=1
    )
    boundary = valid & ((nxt != s_sorted) | (idx == nvalid - 1))
    # each item's group-boundary index: reverse cumulative min of boundary idx
    b_idx = jnp.where(boundary, idx, g - 1)
    b_idx = jax.lax.associative_scan(jnp.minimum, b_idx, reverse=True, axis=1)
    group_precision = jnp.take_along_axis(precision, b_idx, axis=1)
    delta_recall = tp_ap / jnp.maximum(npos_ap, 1)
    return jnp.sum(delta_recall * group_precision, axis=1)


@functools.partial(
    jax.jit, static_argnames=("r_at_n", "robust", "topk", "full_rank")
)
def ranked_retrieval_metrics(
    scores,
    tp,
    ignore,
    r_at_n: Tuple[int, ...] = (30, 50, 100),
    robust: bool = True,
    topk: int = 0,
    full_rank: bool = False,
):
    """scores [Q,G] f32; tp/ignore [Q,G] bool →
    dict(ap [Q], recalls [Q,len(r_at_n)], npos [Q], top_idx [Q,topk]?).

    ``full_rank`` additionally returns the sorted per-query stream —
    tp_sorted/scores_sorted [Q,G] (pre-robust labels) and nvalid [Q] — for
    the system_ap_dict diagnostics dump (dataloader_baseline.py:448-456).

    Sorting is stable descending, so ties keep gallery order (FAISS likewise
    returns ties in index order).
    """
    q, g = scores.shape
    s = jnp.where(ignore, -jnp.inf, scores.astype(jnp.float32))
    order = jnp.argsort(-s, axis=1, stable=True)
    s_sorted = jnp.take_along_axis(s, order, axis=1)
    valid = jnp.take_along_axis(~ignore, order, axis=1)
    tp_sorted = jnp.take_along_axis(tp & ~ignore, order, axis=1)

    idx = jnp.arange(g)[None, :]
    nvalid = jnp.sum(valid, axis=1, keepdims=True)

    # ---- AP with the robust-mAP quirk on a copy of the labels ----
    tp_ap = tp_sorted
    if robust:
        tp_ap = tp_ap | (idx == nvalid - 1)
    tp_ap = tp_ap & valid
    ap = ap_from_sorted(s_sorted, tp_ap, valid, nvalid)

    # ---- R@N on the unmodified labels ----
    npos = jnp.sum(tp_sorted & valid, axis=1)
    recalls = []
    for n in r_at_n:
        hits = jnp.sum(tp_sorted & valid & (idx < n), axis=1)
        recalls.append(hits / (npos + 1e-10))
    out = dict(
        ap=ap,
        recalls=jnp.stack(recalls, axis=1),
        npos=npos,
    )
    if topk:
        out["top_idx"] = order[:, :topk]
    if full_rank:
        out["tp_sorted"] = tp_sorted & valid
        out["scores_sorted"] = s_sorted
        out["nvalid"] = nvalid[:, 0]
    return out
