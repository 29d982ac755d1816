"""On-device moment-retrieval metrics: NMS + grouped-order AP/R@N on the TPU.

The host postprocess (retrieval/moment.py::moment_query_metrics, mirroring
dataloader_baseline.py:1236-1330) needs the full ``[Q, ~10^6-moment]`` score
matrix on the host — 226 s of a 334 s production-scale run went to that
device→host transfer alone (benchmarks/EVAL_SCALE_r03_tpu_moment.json). This
module keeps the scores on device and reads back only per-query scalars
(AP + R@N), making the transfer cost independent of gallery size.

Exactness. Every decision the reference makes is reproduced bit-for-bit:

* **greedy NMS per video** (+1 length convention, suppress at iou ≥ thresh,
  score-desc/index-asc tie order): window boundaries are integer seconds on
  the 5 s grid, so intersections/unions are small exact-in-f32 integers and
  the iou test is rearranged division-free as
  ``inter·(1+t) ≥ t·(len_i+len_j)`` — exact for t with a short mantissa
  (0.5 in practice). Greedy order is obtained by sorting each video's
  members once (stable, so ties fall back to ascending global index exactly
  like ``np.argsort(-scores, kind="stable")``), then a `fori_loop` over
  sorted slots: slot i suppresses later overlapping slots iff it is itself
  unsuppressed — the textbook sequential greedy, vectorized over
  [Q, videos, W].
* **grouped order** (videos by their best *pre-NMS* moment's global rank,
  members by score within a video, dataloader:1283-1309): reconstructed
  without a global sort — videos are ordered by (best score desc, best
  member's global index asc) via two stable argsorts over the [Q, V] video
  axis, and a member's grouped position is the exclusive cumsum of valid
  members over ordered videos plus its within-video exclusive cumsum.
* **robust-mAP flip** at the grouped-order-last valid item and **R@N over
  grouped positions** follow directly from the grouped positions.
* **AP** is one masked global sort + the shared sklearn-tie kernel
  (ops/ranking.ap_from_sorted).

Videos are bucketed by moment count (W) into a few padded [Q, V_bucket, W]
tensors so the sequential NMS scan length matches each video's size instead
of the global maximum; all bucket bookkeeping is static per evaluation, so
each query chunk is a single compiled program whose inputs are the query
features and two small int32 arrays.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.core.logging import get_logger
from vqwild_tpu.ops.ranking import ap_from_sorted

log = get_logger("retrieval.moment_device")

# bucket pad widths: ~1.33x steps keep padding waste low while bounding the
# number of compiled NMS loops (one per non-empty bucket). The 16,384 ceiling
# is a hard per-video limit — the real 100_20_80 untrimmed DB maxes at 3,549
# windows/video (p99 897); a ~47-minute video would cross it, so the caller
# (retrieval/moment.py) falls back to the host postprocess for oversize
# galleries instead of letting _bucket_plan raise.
_BUCKET_WIDTHS = (
    16, 32, 48, 64, 96, 128, 192, 256, 384, 512,
    768, 1024, 1536, 2048, 3072, 4096, 8192, 16384,
)


def _bucket_plan(vidx: np.ndarray, n_videos: int):
    """Group videos by member count into padded buckets.

    ``vidx`` [G] must be contiguous per video (build_gallery's layout).
    Returns a list of dicts with static per-bucket arrays:
      gather [Vb, W] int64 moment index (pad = G), vglob [Vb] video index.
    """
    counts = np.bincount(vidx, minlength=n_videos)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    buckets = []
    for lo, hi in zip((0,) + _BUCKET_WIDTHS, _BUCKET_WIDTHS):
        vids = np.where((counts > lo) & (counts <= hi))[0]
        if len(vids) == 0:
            continue
        gather = np.full((len(vids), hi), len(vidx), np.int64)
        for r, v in enumerate(vids):
            gather[r, : counts[v]] = np.arange(offsets[v], offsets[v + 1])
        buckets.append(dict(w=hi, gather=gather, vglob=vids.astype(np.int32)))
    widest = max((c for c in counts), default=0)
    if widest > _BUCKET_WIDTHS[-1]:
        raise ValueError(
            f"a video has {widest} moments > max bucket {_BUCKET_WIDTHS[-1]}"
        )
    return buckets


@functools.partial(jax.jit, static_argnames=("rows",))
def _pad_rows(scores, rows: int):
    return jnp.pad(scores, ((0, rows), (0, 0)))


def _nms_sorted(ss, st, en, thresh: float):
    """Greedy temporal NMS over score-sorted members.

    ss/st/en [Q, Vb, W] sorted by score desc (pads: ss=-inf). Returns the
    kept mask in sorted order. +1 length convention; suppress iff iou ≥ t,
    computed division-free (exact for integer-second geometry).

    Blocked for HBM bandwidth: the textbook slot-at-a-time fori_loop re-reads
    the full [Q, Vb, W] geometry every iteration — ~0.44 s of a 0.74 s metric
    chunk at the real untrimmed-DB bucket mix went to this loop's ~8k
    iterations × ~500 MB traffic (benchmarks/profile_moment_stages.py).
    Instead, greedy runs exactly per K-slot block: the sequential inner loop
    touches only the [Q, Vb, K] block slices, and each finished block
    suppresses ALL later slots in one fused broadcast-reduce pass, so the
    full-width arrays are read W/K times instead of W times. Identical
    decisions to the sequential loop: entering block t, every suppression
    from blocks < t has been applied (the cross-block pass covers all later
    slots), and within the block the slot order is the textbook greedy."""
    w = ss.shape[-1]
    lens = en - st + 1.0
    real = ss > -jnp.inf

    def inner(stb, enb, lnb, iota_k):
        """Sequential greedy within one block (slices [Q, Vb, K])."""

        def body(i, supp_b):
            cs = jax.lax.dynamic_slice_in_dim(stb, i, 1, axis=2)
            ce = jax.lax.dynamic_slice_in_dim(enb, i, 1, axis=2)
            li = jax.lax.dynamic_slice_in_dim(lnb, i, 1, axis=2)
            active = ~jax.lax.dynamic_slice_in_dim(supp_b, i, 1, axis=2)
            inter = jnp.maximum(
                0.0, jnp.minimum(ce, enb) - jnp.maximum(cs, stb) + 1.0
            )
            hit = inter * (1.0 + thresh) >= thresh * (li + lnb)
            return supp_b | (hit & active & (iota_k[None, None, :] > i))

        return body

    k = next((c for c in (64, 48, 32, 16) if w % c == 0), None)
    if k is None or w <= k:
        supp = jax.lax.fori_loop(0, w, inner(st, en, lens, jnp.arange(w)), ~real)
        return ~supp & real

    iota = jnp.arange(w)
    iota_k = jnp.arange(k)

    def block(t, supp):
        s0 = t * k
        stb = jax.lax.dynamic_slice_in_dim(st, s0, k, axis=2)
        enb = jax.lax.dynamic_slice_in_dim(en, s0, k, axis=2)
        lnb = jax.lax.dynamic_slice_in_dim(lens, s0, k, axis=2)
        supp_b = jax.lax.dynamic_slice_in_dim(supp, s0, k, axis=2)
        supp_b = jax.lax.fori_loop(0, k, inner(stb, enb, lnb, iota_k), supp_b)
        supp = jax.lax.dynamic_update_slice_in_dim(supp, supp_b, s0, axis=2)
        # kept block slots suppress every later slot in one fused pass
        # ([Q, Vb, K, W] broadcast any-reduced over K without materialising)
        kept_b = ~supp_b
        inter = jnp.maximum(
            0.0,
            jnp.minimum(enb[..., :, None], en[..., None, :])
            - jnp.maximum(stb[..., :, None], st[..., None, :])
            + 1.0,
        )
        hit = inter * (1.0 + thresh) >= thresh * (
            lnb[..., :, None] + lens[..., None, :]
        )
        sup_any = jnp.any(hit & kept_b[..., :, None], axis=2)
        return supp | (sup_any & (iota[None, None, :] >= s0 + k))

    supp = jax.lax.fori_loop(0, w // k, block, ~real)
    return ~supp & real


def _chunk_metrics_core(
    scores,
    q_label,
    ignore_vids,
    buckets,
    n_moments,
    nms_threshold,
    tp_when_no_match,
    r_at_n,
    robust,
):
    """One query chunk → (ap [Q], recalls [Q, len(r_at_n)], npos [Q]).

    ``buckets``: tuple of dicts of device-resident gallery constants (traced
    pytree args — shapes are static, the 10⁷ elements are not baked into the
    HLO). scores [Q, >=G] f32 (extra padded columns ignored), q_label [Q]
    int32, ignore_vids [Q, I] int32 gallery video indices (-1 pads).
    Trace-time only — callers jit (``_chunk_metrics`` per chunk, or
    ``_scan_metrics`` mapping many chunks inside one program).
    """
    q = scores.shape[0]
    g = n_moments
    s_ext = jnp.concatenate(
        [
            jax.lax.slice(scores, (0, 0), (q, g)),
            jnp.full((q, 1), -jnp.inf, scores.dtype),
        ],
        axis=1,
    )

    per_bucket = []
    vbest_score, vbest_idx = [], []
    for b in buckets:
        sb = jnp.take(s_ext, b["gather"], axis=1)  # [Q, Vb, W]
        vb, w = b["gather"].shape
        bcast = lambda a: jnp.broadcast_to(a[None], (q, vb, w))
        key, stt, enn, lab, hit, gidx = jax.lax.sort(
            (
                -sb,
                bcast(b["starts"]),
                bcast(b["ends"]),
                bcast(b["labels"]),
                bcast(b["hit_ok"]),
                bcast(b["gather"]),
            ),
            dimension=2,
            is_stable=True,
            num_keys=1,
        )
        ss = -key
        kept = _nms_sorted(ss, stt, enn, nms_threshold)
        igb = jnp.any(
            b["vglob"][None, :, None] == ignore_vids[:, None, :], axis=-1
        )  # [Q, Vb]
        validkept = kept & ~igb[:, :, None]
        tp = jnp.where(
            lab == q_label[:, None, None], hit, tp_when_no_match
        )
        within = jnp.cumsum(validkept, axis=2, dtype=jnp.int32) - validkept
        per_bucket.append(dict(ss=ss, tp=tp, validkept=validkept, within=within))
        vbest_score.append(ss[:, :, 0])
        vbest_idx.append(gidx[:, :, 0])

    # ---- cross-video grouped order (videos in bucket-concatenated axis) ----
    bs = jnp.concatenate(vbest_score, axis=1)  # [Q, V]
    bi = jnp.concatenate(vbest_idx, axis=1)
    nv = jnp.concatenate(
        [pb["validkept"].sum(axis=2, dtype=jnp.int32) for pb in per_bucket], axis=1
    )
    # videos by (best score desc, best member global index asc): compose two
    # stable argsorts (radix over the lexicographic key)
    perm1 = jnp.argsort(bi, axis=1, stable=True)
    key2 = jnp.take_along_axis(-bs, perm1, axis=1)
    perm2 = jnp.argsort(key2, axis=1, stable=True)
    vorder = jnp.take_along_axis(perm1, perm2, axis=1)
    nv_ord = jnp.take_along_axis(nv, vorder, axis=1)
    base_ord = jnp.cumsum(nv_ord, axis=1) - nv_ord  # exclusive
    inv = jnp.argsort(vorder, axis=1, stable=True)  # inverse permutation
    base = jnp.take_along_axis(base_ord, inv, axis=1)  # [Q, V] per concat-video
    total_valid = nv.sum(axis=1)  # [Q]

    # ---- per-moment grouped positions, R@N, flip, AP inputs ----
    npos = jnp.zeros((q,), jnp.int32)
    rhits = [jnp.zeros((q,), jnp.int32) for _ in r_at_n]
    ap_scores, ap_tp = [], []
    voff = 0
    for pb in per_bucket:
        vb = pb["ss"].shape[1]
        base_b = jax.lax.slice(base, (0, voff), (q, voff + vb))
        voff += vb
        gpos = base_b[:, :, None] + pb["within"]
        vk = pb["validkept"]
        tpv = pb["tp"] & vk
        npos += tpv.sum(axis=(1, 2), dtype=jnp.int32)
        for k, n in enumerate(r_at_n):
            rhits[k] += (tpv & (gpos < n)).sum(axis=(1, 2), dtype=jnp.int32)
        tp_ap = tpv
        if robust:
            tp_ap = tp_ap | (vk & (gpos == (total_valid[:, None, None] - 1)))
        ap_scores.append(jnp.where(vk, pb["ss"], -jnp.inf).reshape(q, -1))
        ap_tp.append(tp_ap.reshape(q, -1))

    s_m = jnp.concatenate(ap_scores, axis=1)
    t_m = jnp.concatenate(ap_tp, axis=1)
    key, tp_sorted = jax.lax.sort((-s_m, t_m), dimension=1, is_stable=True, num_keys=1)
    s_sorted = -key
    valid_sorted = s_sorted > -jnp.inf
    ap = ap_from_sorted(s_sorted, tp_sorted & valid_sorted, valid_sorted,
                        total_valid[:, None])
    # recalls divide on the host in f64 (exact integer numerators here)
    return ap, jnp.stack(rhits, axis=1), npos


_chunk_metrics = functools.partial(
    jax.jit,
    static_argnames=(
        "n_moments",
        "nms_threshold",
        "tp_when_no_match",
        "r_at_n",
        "robust",
    ),
)(_chunk_metrics_core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_moments",
        "nms_threshold",
        "tp_when_no_match",
        "r_at_n",
        "robust",
    ),
)
def _scan_metrics(
    q_bank,
    gallery,
    q_rows,
    q_label,
    ignore_vids,
    buckets,
    n_moments,
    nms_threshold,
    tp_when_no_match,
    r_at_n,
    robust,
):
    """MANY query chunks as one program: score + NMS + grouped-order metrics
    for a [S, B]-shaped super-chunk via ``lax.map`` over the S axis.

    Per-chunk dispatch costs ~8 host↔device round-trips (query-row upload,
    score execute, label/ignore uploads, metric execute, three readbacks);
    at 139 chunks the full-DB eval paid ~10³ RPCs — roughly half its 842 s
    behind the dev relay (benchmarks/EVAL_SCALE_r05_tpu.json). Mapping S
    chunks inside one executable costs 3 uploads + 1 execute + 1 readback
    per S chunks while the [B, G] score rows and [B, Vb, W] bucket tensors
    still exist one chunk at a time (lax.map is sequential), so device
    working-set is unchanged.

    q_rows [S, B, query_num] i32 rows into ``q_bank`` (pad -1 within a
    query, whole padded chunks replicate real queries — extras dropped
    host-side); q_label [S, B] i32; ignore_vids [S, B, I] i32.
    → (ap [S, B], rhits [S, B, len(r_at_n)], npos [S, B]).
    """
    from vqwild_tpu.ops.ranking import gather_scores

    def body(chunk):
        qr, ql, ig = chunk
        scores = gather_scores(q_bank, gallery, qr, False)
        return _chunk_metrics_core(
            scores,
            ql,
            ig,
            buckets,
            n_moments,
            nms_threshold,
            tp_when_no_match,
            r_at_n,
            robust,
        )

    return jax.lax.map(body, (q_rows, q_label, ignore_vids))


class DeviceMomentEngine:
    """Per-evaluation device state + chunked metric computation.

    Parameters mirror the host postprocess inputs (retrieval/moment.py):
    window geometry/hit labels are the build_gallery outputs; ``tiou`` is
    applied HERE on the host in float64 (the device only ever sees the
    boolean), so tp thresholds are bit-identical to the host path.
    """

    def __init__(
        self,
        vidx: np.ndarray,
        start_sec: np.ndarray,
        end_sec: np.ndarray,
        hit_label: np.ndarray,
        hit_iou: np.ndarray,
        n_videos: int,
        *,
        nms_threshold: float = 0.5,
        tiou_threshold: float = 0.5,
        chunk: int = 32,
        max_ignore: int = 8,
        mesh=None,
    ):
        self.n_moments = len(vidx)
        self.max_ignore = max_ignore
        # mesh-sharded mode: gallery constants replicate over the mesh and the
        # query-chunk axis shards over ALL mesh axes — each device runs the
        # NMS/grouped-order program on chunk/n_devices queries with full score
        # rows. The scorer's column-sharded [B, G] scores are resharded
        # (all-to-all over ICI) into this row layout by a jitted identity.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = tuple(mesh.axis_names)
            n_dev = 1
            for a in axes:
                n_dev *= mesh.shape[a]
            chunk = max(n_dev, (chunk // n_dev) * n_dev)  # divisible chunks
            self._repl = NamedSharding(mesh, P())
            self._row2d = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0], None))
            self._row1d = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))
            _const = lambda x: jax.device_put(np.asarray(x), self._repl)
        else:
            self._repl = self._row2d = self._row1d = None
            _const = jnp.asarray
        self.chunk = chunk
        vidx = np.asarray(vidx, np.int64)
        # label vocabulary: gallery hit labels now, query labels on demand
        self._label_ids = {"": -1}
        labs = np.empty(self.n_moments, np.int32)
        for i, lab in enumerate(hit_label):
            labs[i] = self._label_ids.setdefault(str(lab), len(self._label_ids))
        hit_ok = np.asarray(hit_iou, np.float64) >= tiou_threshold
        buckets = []
        for b in _bucket_plan(vidx, n_videos):
            gi = b["gather"]
            pad = gi == self.n_moments
            starts = np.where(pad, 0.0, np.asarray(start_sec, np.float64)[
                np.minimum(gi, self.n_moments - 1)
            ]).astype(np.float32)
            ends = np.where(pad, -1.0, np.asarray(end_sec, np.float64)[
                np.minimum(gi, self.n_moments - 1)
            ]).astype(np.float32)
            labels = np.where(pad, -1, labs[np.minimum(gi, self.n_moments - 1)])
            hok = np.where(pad, False, hit_ok[np.minimum(gi, self.n_moments - 1)])
            buckets.append(
                dict(
                    gather=_const(gi.astype(np.int32)),
                    vglob=_const(b["vglob"]),
                    starts=_const(starts),
                    ends=_const(ends),
                    labels=_const(labels.astype(np.int32)),
                    hit_ok=_const(hok),
                )
            )
        self._buckets = tuple(buckets)
        self._warmed_scan: dict = {}
        self._nms_threshold = float(nms_threshold)
        # upstream: iou_q = where(label match, hit_iou, 0.0); tp = iou_q >= t
        self._tp_when_no_match = bool(0.0 >= tiou_threshold)
        log.info(
            "device moment engine: %d moments, %d videos, %d buckets (padded %d)",
            self.n_moments,
            n_videos,
            len(buckets),
            sum(int(b["gather"].shape[0] * b["gather"].shape[1]) for b in buckets),
        )

    def label_id(self, label: str) -> int:
        return self._label_ids.setdefault(str(label), len(self._label_ids))

    def dispatch(
        self,
        scores,
        q_labels: Sequence[int],
        ignore_vids: List[List[int]],
        r_at_n: Tuple[int, ...],
        robust: bool,
    ):
        """Enqueue one chunk (async): scores device [B, >=G] f32 (a
        GalleryScorer output); q_labels [B] int ids; ignore_vids per-query
        gallery-video index lists. Returns an opaque handle for
        ``finalize``. Pads the chunk to the engine's fixed chunk size so
        every call hits one compiled program; the [B]-sized outputs stay on
        device so chunks pipeline through a high-latency link."""
        b = scores.shape[0]
        assert b <= self.chunk, (b, self.chunk)
        ql = np.full(self.chunk, -1, np.int32)
        ql[:b] = np.asarray(q_labels, np.int32)
        ig = np.full((self.chunk, self.max_ignore), -1, np.int32)
        for i, vids in enumerate(ignore_vids):
            if len(vids) > self.max_ignore:
                raise ValueError(f"{len(vids)} ignore videos > {self.max_ignore}")
            ig[i, : len(vids)] = vids
        if b < self.chunk:
            # jitted pad — eager ops cost a full round-trip on a
            # remote-dispatch backend
            scores = _pad_rows(scores, rows=self.chunk - b)
        if self.mesh is not None:
            # reshard column-sharded scorer output → query-row-sharded
            # (all-to-all over ICI); small arrays land pre-sharded so the
            # whole chunk program runs data-parallel over queries
            scores = jax.device_put(scores, self._row2d)
            ql_dev = jax.device_put(ql, self._row1d)
            ig_dev = jax.device_put(ig, self._row2d)
        else:
            ql_dev = jnp.asarray(ql)
            ig_dev = jnp.asarray(ig)
        ap, rhits, npos = _chunk_metrics(
            scores,
            ql_dev,
            ig_dev,
            self._buckets,
            n_moments=self.n_moments,
            nms_threshold=self._nms_threshold,
            tp_when_no_match=self._tp_when_no_match,
            r_at_n=tuple(r_at_n),
            robust=bool(robust),
        )
        return ap, rhits, npos, b

    @staticmethod
    def finalize(handle):
        """→ (ap [B] f64, recalls [B, len(r_at_n)] f64) for one dispatch."""
        ap_d, rhits_d, npos_d, b = handle
        # one transfer for all three outputs, not one np.asarray each —
        # per-RPC latency swings 0.05–5 s behind the dev relay
        ap_h, rhits_h, npos_h = jax.device_get((ap_d, rhits_d, npos_d))
        ap = np.asarray(ap_h, np.float64)[:b]
        # identical arithmetic to the host path: npos = tp.sum() + 1e-10 (f64)
        npos = np.asarray(npos_h, np.float64)[:b] + 1e-10
        recalls = np.asarray(rhits_h, np.float64)[:b] / npos[:, None]
        return ap, recalls

    def dispatch_scan(self, q_bank, gallery, q_rows, q_labels, ignore_vids,
                      r_at_n: Tuple[int, ...], robust: bool):
        """Enqueue S chunks as ONE device program (async): q_rows
        [S, B, query_num] i32 rows into ``q_bank`` (whole padded chunks
        replicate real queries; the caller drops their outputs); q_labels
        [S, B] i32; ignore_vids [S, B, max_ignore] i32 (-1 pads). Scores are
        computed inside the program from the device-resident bank, so the
        upload is three small i32 arrays per S chunks. Single-device only —
        the mesh path reshards per chunk in ``dispatch``."""
        assert self.mesh is None, "scan dispatch is the single-device path"
        s, b = q_rows.shape[:2]
        assert b == self.chunk, (b, self.chunk)
        args = (
            q_bank,
            gallery,
            jnp.asarray(np.asarray(q_rows, np.int32)),
            jnp.asarray(np.asarray(q_labels, np.int32)),
            jnp.asarray(np.asarray(ignore_vids, np.int32)),
            self._buckets,
        )
        key = ("scan", tuple(q_bank.shape), tuple(gallery.shape), s,
               q_rows.shape[2], tuple(r_at_n), bool(robust))
        compiled = self._warmed_scan.get(key)
        if compiled is not None:
            return compiled(*args)
        return _scan_metrics(
            *args,
            n_moments=self.n_moments,
            nms_threshold=self._nms_threshold,
            tp_when_no_match=self._tp_when_no_match,
            r_at_n=tuple(r_at_n),
            robust=bool(robust),
        )

    @staticmethod
    def finalize_scan(handle):
        """→ (ap [S*B] f64, recalls [S*B, len(r_at_n)] f64), one transfer."""
        ap_d, rhits_d, npos_d = handle
        ap_h, rhits_h, npos_h = jax.device_get((ap_d, rhits_d, npos_d))
        s, b = np.asarray(ap_h).shape
        ap = np.asarray(ap_h, np.float64).reshape(s * b)
        npos = np.asarray(npos_h, np.float64).reshape(s * b) + 1e-10
        recalls = (
            np.asarray(rhits_h, np.float64).reshape(s * b, -1) / npos[:, None]
        )
        return ap, recalls

    def warm_scan(self, bank_shape, gallery_shape, s: int, query_num: int,
                  r_at_n: Tuple[int, ...], robust: bool):
        """AOT-compile the scan program (shapes only; bucket constants are
        already on device). Keeps the dispatch loop compile-free and lands
        the executable in the persistent cache."""
        sd = jax.ShapeDtypeStruct
        key = ("scan", tuple(bank_shape), tuple(gallery_shape), s, query_num,
               tuple(r_at_n), bool(robust))
        if key in self._warmed_scan:
            return self._warmed_scan[key]
        compiled = _scan_metrics.lower(
            sd(tuple(bank_shape), np.float32),
            sd(tuple(gallery_shape), np.float32),
            sd((s, self.chunk, query_num), np.int32),
            sd((s, self.chunk), np.int32),
            sd((s, self.chunk, self.max_ignore), np.int32),
            self._buckets,
            n_moments=self.n_moments,
            nms_threshold=self._nms_threshold,
            tp_when_no_match=self._tp_when_no_match,
            r_at_n=tuple(r_at_n),
            robust=bool(robust),
        ).compile()
        self._warmed_scan[key] = compiled
        return compiled

    def metrics(
        self,
        scores,
        q_labels: Sequence[int],
        ignore_vids: List[List[int]],
        r_at_n: Tuple[int, ...],
        robust: bool,
    ):
        """Synchronous dispatch+finalize of one chunk."""
        return self.finalize(
            self.dispatch(scores, q_labels, ignore_vids, r_at_n, robust)
        )
