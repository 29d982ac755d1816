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
    # distinct-score group boundaries (last item of each tie group)
    nxt = jnp.concatenate(
        [s_sorted[:, 1:], jnp.full((q, 1), -jnp.inf, s_sorted.dtype)], axis=1
    )
    boundary = valid & ((nxt != s_sorted) | (idx == nvalid - 1))
    # Backfill each item with its group-boundary precision. Each item needs
    # precision at b(i) = the first boundary at-or-after i (its tie group's
    # last item). Both candidate implementations of a reverse "first-defined"
    # scan are XLA:TPU pathologies at this scale: an index scan + gather
    # fuses the gather's index operand with the whole scan DAG (recomputed
    # per gathered element — never finishes at G≈10^5), and a value-carrying
    # associative_scan with a custom combinator makes *compilation*
    # superlinear when a lax.sort feeds it in the same module (60 s at 32 k,
    # unbounded at 10^6 — the moment eval's scale). Instead exploit
    # monotonicity: cum_tp and position are nondecreasing along the row, so
    # the values AT b(i) are reverse cummins of the boundary-masked streams —
    # and lax.cummin is a native cumulative op that compiles like cumsum.
    # precision[b] = cum_tp[b] / (b+1) — the same int→f32 true divide the
    # everywhere-precision formulation used, evaluated at the same operands.
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    bpos_min = jax.lax.cummin(
        jnp.where(boundary, idx, big).astype(jnp.int32), axis=1, reverse=True
    )
    bcum_min = jax.lax.cummin(
        jnp.where(boundary, cum_tp, big).astype(jnp.int32), axis=1, reverse=True
    )
    defined = bpos_min < big
    # items past the last boundary backfill 0, which only occurs in the
    # invalid tail where delta_recall is already 0
    group_precision = jnp.where(
        defined, bcum_min / jnp.where(defined, bpos_min + 1, 1), 0.0
    )
    delta_recall = tp_ap / jnp.maximum(npos_ap, 1)
    return jnp.sum(delta_recall * group_precision, axis=1)


def _metrics_from_masks(
    scores,
    tp,
    ignore,
    r_at_n: Tuple[int, ...],
    robust: bool,
    topk: int,
    full_rank: bool,
):
    """Shared metric core; see ranked_retrieval_metrics for the contract."""
    q, g = scores.shape
    s = jnp.where(ignore, -jnp.inf, scores.astype(jnp.float32))
    # One stable variadic sort carrying the label/validity payloads instead
    # of argsort + take_along_axis gathers: XLA:TPU fuses each gather's index
    # operand with the sort DAG, and at G≈10^5 the fused program simply never
    # finishes at runtime (the clip eval's [256, 97829] chunk hung >8 min on
    # a program whose payload-sort form executes in seconds — the moment
    # engine runs the same shape of sort at [32, 2.35M] in 2.8 s/chunk).
    # Ordering is identical to np.argsort(-s, kind="stable"): same -s key,
    # ascending, stable, and s_sorted = -(-s) restores the original bits
    # (IEEE total order puts -0.0 keys before +0.0 exactly as argsort did).
    operands = [-s, tp & ~ignore, ~ignore]
    if topk:
        operands.append(
            jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None, :], (q, g))
        )
    sorted_ops = jax.lax.sort(
        tuple(operands), dimension=1, is_stable=True, num_keys=1
    )
    s_sorted = -sorted_ops[0]
    tp_sorted = sorted_ops[1]
    valid = sorted_ops[2]
    order = sorted_ops[3] if topk else None

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
    return _metrics_from_masks(scores, tp, ignore, r_at_n, robust, topk, full_rank)


def build_eval_masks(gal_label_ids, gal_vid_ids, q_label_ids, q_src_vids):
    """Device-side tp/ignore construction from integer id arrays.

    The host-mask path ships two [Q,G] bools per chunk (50 MB at clip scale);
    behind a slow host↔device link that transfer dominated the whole eval.
    Ids make the per-chunk traffic KB-scale: gallery columns carry a label id
    and a video id ([G] i32, uploaded once), queries carry a label id and
    their multi-query source-video ids ([Q] + [Q,K] i32).

    tp[q,g]     = gal_label_ids[g] == q_label_ids[q]
    ignore[q,g] = gal_vid_ids[g] ∈ q_src_vids[q]  (the multi-query source
                  videos, dataloader_baseline.py:1532)  |  padded column

    Padded gallery columns are marked with gal_vid_ids == -1 (and label -1);
    q_src_vids pads with -2 so query padding never matches column padding.
    """
    tp = gal_label_ids[None, :] == q_label_ids[:, None]
    pad = gal_vid_ids < 0
    ignore = jnp.broadcast_to(pad[None, :], tp.shape)
    for k in range(q_src_vids.shape[1]):  # K is small & static: unrolled
        ignore = ignore | (gal_vid_ids[None, :] == q_src_vids[:, k][:, None])
    return tp & ~pad[None, :], ignore


@functools.partial(
    jax.jit,
    static_argnames=("r_at_n", "robust", "topk", "full_rank", "use_pallas"),
)
def fused_chunk_metrics(
    q_bank,
    gallery,
    gal_label_ids,
    gal_vid_ids,
    q_rows,
    q_label_ids,
    q_src_vids,
    r_at_n: Tuple[int, ...] = (30, 50, 100),
    robust: bool = True,
    topk: int = 0,
    full_rank: bool = False,
    use_pallas: bool = False,
):
    """One device dispatch per query chunk: gather query features from a
    device-resident bank, score against the (optionally row-sharded) gallery,
    build tp/ignore from ids, and reduce to the per-query metrics — so the
    only per-chunk host↔device traffic is a few KB of i32 ids up and the
    [Q]-sized metric vectors down.

    q_bank [Nq,D] device bank of candidate query features (for trimmed eval
    this IS the gallery — queries are gallery rows, dataloader:1486);
    q_rows [Q,query_num] rows to average per expanded query (pad: -1);
    gallery [G,D]; gal_label_ids/gal_vid_ids [G] i32 (pad: -1);
    q_label_ids [Q] i32; q_src_vids [Q,K] i32 (pad: -2).

    ``use_pallas`` selects the fused TPU distance kernel; the caller decides
    (GSPMD can't partition a pallas_call, so sharded galleries use the XLA
    expansion — see ops.distance._use_pallas).
    """
    scores = gather_scores(q_bank, gallery, q_rows, use_pallas)
    tp, ignore = build_eval_masks(
        gal_label_ids, gal_vid_ids, q_label_ids, q_src_vids
    )
    return _metrics_from_masks(scores, tp, ignore, r_at_n, robust, topk, full_rank)


@functools.partial(jax.jit, static_argnames=("r_at_n", "robust"))
def fused_eval_metrics(
    q_bank,
    gallery,
    gal_label_ids,
    gal_vid_ids,
    q_rows,
    q_label_ids,
    q_src_vids,
    r_at_n: Tuple[int, ...] = (30, 50, 100),
    robust: bool = True,
):
    """The ENTIRE rank loop as one device program: ``lax.map`` over query
    chunks of the fused_chunk_metrics body (metrics-only form).

    q_rows [n_chunks, B, query_num]; q_label_ids [n_chunks, B];
    q_src_vids [n_chunks, B, K] → dict(ap [n_chunks, B],
    recalls [n_chunks, B, len(r_at_n)]).

    Per-chunk dispatch costs ~4 host↔device round-trips (three id uploads +
    the execute); behind the dev relay per-RPC latency swings 0.05–5 s with
    stream health, so a 25-chunk trimmed eval was measured at 5 s–360 s on
    identical code. Mapping the chunk loop inside ONE executable makes the
    whole eval 3 uploads + 1 execute + 1 readback regardless of chunk count,
    while lax.map keeps the [B, G] score/sort intermediates bounded to one
    chunk at a time (same working set as the host-driven loop). Callers pad
    the tail chunk with replicated valid queries and drop the extras host-side
    (padding with -1 rows would NaN the masked-mean gather).
    """

    def body(chunk):
        qr, ql, qs = chunk
        scores = gather_scores(q_bank, gallery, qr, False)
        tp, ignore = build_eval_masks(gal_label_ids, gal_vid_ids, ql, qs)
        out = _metrics_from_masks(
            scores, tp, ignore, r_at_n, robust, 0, False
        )
        return dict(ap=out["ap"], recalls=out["recalls"])

    return jax.lax.map(body, (q_rows, q_label_ids, q_src_vids))


def gather_scores(q_bank, gallery, q_rows, use_pallas: bool = False):
    """Masked-mean gather of query features from a device bank, then the
    distance kernel. q_rows [B,query_num] i32 pads with -1 when a query has
    fewer than query_num source clips (np.mean over the short list in the
    host path). Trace-time only — callers jit."""
    from vqwild_tpu.ops.distance import pairwise_sq_l2

    qmask = (q_rows >= 0).astype(q_bank.dtype)
    qf = jnp.sum(
        q_bank[jnp.maximum(q_rows, 0)] * qmask[..., None], axis=1
    ) / jnp.sum(qmask, axis=1, keepdims=True)
    if use_pallas:
        from vqwild_tpu.ops.pallas_kernels import pairwise_sq_l2_pallas

        return -pairwise_sq_l2_pallas(qf, gallery)
    return -pairwise_sq_l2(qf, gallery)
