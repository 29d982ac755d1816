"""Untrimmed moment retrieval (ARV_Retrieval_Moment,
dataloader_baseline.py:965-1380).

Gallery: every video's tape is sliced into moments of 1..max_clips ×
moment_clip_sec seconds (5s stride); each moment carries its best-tIoU
annotation (closest_hit). Ranking per query: exact-L2 full ranking (device
matmul) → per-video clustering in rank order → temporal NMS per cluster
(ignored moments participate and can suppress) → drop ignored → tp iff
closest-hit label matches and tIoU ≥ 0.5 → AP/R@N.

Faithfully-preserved upstream quirks:
* after NMS the kept list is re-assembled *grouped by video* (videos ordered
  by their best-ranked moment, moments rank-ordered within a video) — the
  robust-mAP flip and the R@N top-N windows operate on this grouped order,
  not pure score order (:1283-1330);
* NMS runs before the ignore filter, so ignored moments can suppress valid
  ones (:1283-1314 vs :386-402).

The per-query postprocess replaces the reference's fork-based multiprocessing
pool (cpu_count()//4 workers) with one of three engines:

* **device** (default on accelerators): NMS + grouped-order metrics computed
  on the TPU (retrieval/moment_device.py) — the [Q, ~10^6] score matrix never
  crosses to the host; the readback is one AP + R@N row per query. This
  removed the dominant production-scale cost (226 s of 334 s was score
  transfer in r3). Mesh-sharded galleries reshard into its query-parallel
  layout (all-to-all over ICI), so it stays auto-selected multi-chip.
* **native**: host postprocess in the C++ thread-pool engine
  (vqwild_tpu/native) — the CPU-backend default (no device link to avoid).
* **numpy threads**: pure-python fallback, also the diagnostics path (it is
  the only engine that exposes the per-query kept stream for cm_dict).
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.core.logging import get_logger
from vqwild_tpu.core.profiling import phase
from vqwild_tpu.data.labels import SplitSpec
from vqwild_tpu.data.sampling import temporal_iou  # canonical def (jax-free)
from vqwild_tpu.data.schema import MomentDB, VideoRecord
from vqwild_tpu.ops import metrics_np
from vqwild_tpu.ops.hostmem import alloc_array
from vqwild_tpu.ops.nms import temporal_nms
from vqwild_tpu.ops.segment_pool import HostWindowPooler, enumerate_moment_windows
from vqwild_tpu.retrieval.aggregate import MetricAggregator
from vqwild_tpu.retrieval.diagnostics import DiagnosticsCollector
from vqwild_tpu.retrieval.features import FeatureExtractor
from vqwild_tpu.retrieval.multiquery import generate_multi_query
from vqwild_tpu.retrieval.sharded import GalleryScorer

log = get_logger("retrieval.moment")


_phase = phase  # shared per-phase accumulator (core/profiling.py)


def closest_hit(annotations, loc_sec, possible_classes):
    """Best-tIoU annotation with an allowed label (:1099-1114); None if the
    video has no allowed annotations."""
    best_iou, best = -1.0, None
    for ann in annotations or ():
        if ann.label not in possible_classes:
            continue
        iou = temporal_iou(ann.segment[0], ann.segment[1], loc_sec[0], loc_sec[1])
        if iou > best_iou:
            best = (ann.label, iou)
            best_iou = iou
    return best


def closest_hits_vectorized(annotations, locs, possible_classes):
    """Batched closest_hit for all W windows of one video → (labels [W] str,
    ious [W]). Ties resolve to the earlier annotation, like the python loop
    (strict > comparison ≡ argmax-first-max)."""
    allowed = [a for a in annotations or () if a.label in possible_classes]
    w = len(locs)
    if not allowed:
        return np.array([""] * w, dtype=object), np.zeros(w)
    a0 = np.array([a.segment[0] for a in allowed])  # [A]
    a1 = np.array([a.segment[1] for a in allowed])
    w0 = locs[:, 0:1]  # [W,1]
    w1 = locs[:, 1:2]
    inter = np.maximum(0.0, np.minimum(a1[None], w1) - np.maximum(a0[None], w0))
    union = np.maximum(a1[None], w1) - np.minimum(a0[None], w0)
    iou = inter / union  # [W, A]
    best = np.argmax(iou, axis=1)
    labels = np.array([allowed[k].label for k in best], dtype=object)
    return labels, iou[np.arange(w), best]


def moment_query_metrics(
    scores: np.ndarray,
    video_idx: np.ndarray,
    start_sec: np.ndarray,
    end_sec: np.ndarray,
    iou: np.ndarray,
    ignore: np.ndarray,
    nms_threshold: float = 0.5,
    tiou_threshold: float = 0.5,
    r_at_n: Sequence[int] = (30, 50, 100),
    robust: bool = True,
    return_diag: bool = False,
) -> Tuple[float, List[float]]:
    """One query's full postprocess (the reference worker body, :1236-1330).

    With ``return_diag`` a third element is returned: dict(valid=[K] kept
    moment indices in grouped order, tp=[K] bool pre-robust labels,
    scores=[K]) — the ignore-filtered ranked stream for the cm_dict payload.
    """
    order = np.argsort(-scores, kind="stable")
    # cluster by video in ranked order
    kept_global: List[np.ndarray] = []
    # group moments by video preserving first-appearance order
    vids_in_order, first_pos = np.unique(video_idx[order], return_index=True)
    vids_by_appearance = vids_in_order[np.argsort(first_pos)]
    ranked_vidx = video_idx[order]
    for vid in vids_by_appearance:
        members = order[ranked_vidx == vid]  # ranked order within the video
        dets = np.stack(
            [start_sec[members], end_sec[members], scores[members]], axis=1
        ).astype(np.float32)
        keep = temporal_nms(dets, nms_threshold)
        keep_set = set(keep)
        # upstream re-filters in list (=ranked) order (:1306-1309)
        kept_global.append(members[[i for i in range(len(members)) if i in keep_set]])
    grouped = np.concatenate(kept_global) if kept_global else np.array([], np.int64)
    valid = grouped[~ignore[grouped]]
    if len(valid) == 0:
        empty = (0.0, [0.0 for _ in r_at_n])
        if return_diag:
            return empty + (
                dict(
                    valid=valid,
                    tp=np.zeros(0, bool),
                    scores=np.zeros(0, np.float32),
                ),
            )
        return empty
    tp = iou[valid] >= tiou_threshold
    y_true = tp.astype(np.int64).copy()
    if robust:
        y_true[-1] = 1  # last item of the *grouped* order (:389)
    ap = metrics_np.average_precision(y_true, scores[valid])
    npos = float(tp.sum()) + 1e-10
    recalls = [float(tp[:n].sum() / npos) for n in r_at_n]
    if return_diag:
        return ap, recalls, dict(valid=valid, tp=tp, scores=scores[valid])
    return ap, recalls


class ARVRetrievalMoment:
    def __init__(
        self,
        db: MomentDB,
        spec: SplitSpec,
        extractor: FeatureExtractor,
        moment_clip_sec: int = 5,
        max_clips_per_moment: int = 26,
        fps: int = 3,
        temporal_stride: int = 1,
        query_num: int = 1,
        multi_query_extra: int = 4,
        nms_threshold: float = 0.5,
        tiou_threshold: float = 0.5,
        r_at_n: Sequence[int] = (30, 50, 100),
        robust_map: bool = True,
        rank_chunk: int = 128,
        read_cache: bool = False,
        workers: int = 8,
        collect_diagnostics: bool = False,
        mesh=None,
        score_readback_dtype: str = "float32",
        engine: str = "auto",
        scan_chunks: int = 16,
    ):
        self.extractor = extractor
        self.moment_clip_sec = moment_clip_sec
        self.max_clips = max_clips_per_moment
        self.fps = fps
        self.temporal_stride = temporal_stride
        self.query_num = query_num
        self.multi_query_extra = multi_query_extra
        self.nms_threshold = nms_threshold
        self.tiou_threshold = tiou_threshold
        self.r_at_n = tuple(r_at_n)
        self.robust_map = robust_map
        self.rank_chunk = rank_chunk
        self.read_cache = read_cache
        # 0 means "no loader workers" at the CLI; postprocess still needs >=1
        self.workers = max(1, workers)
        self.collect_diagnostics = collect_diagnostics
        self.mesh = mesh
        # "bfloat16" halves the [rank_chunk, ~10^6-moment] device→host score
        # transfer — the dominant cost behind a slow link (measured 226 s of
        # 334 s for fp32 at production scale through the dev relay). Metric
        # impact is rounding-level rank flips between near-tied moments
        # (tests/test_retrieval.py asserts headline-metric agreement).
        if score_readback_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown score_readback_dtype {score_readback_dtype!r}")
        self.score_readback_dtype = score_readback_dtype
        # postprocess engine: "device" keeps the [Q, G] scores on device and
        # reads back only per-query scalars (retrieval/moment_device.py;
        # mesh-sharded galleries reshard into its query-parallel layout);
        # "host" ships scores to the native-C++/numpy postprocess. "auto"
        # picks device on accelerators except when diagnostics need the
        # per-query kept stream or a video overflows the engine's bucket cap.
        if engine not in ("auto", "device", "host"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        # device-engine super-chunking: run `scan_chunks` query chunks inside
        # ONE program (lax.map) so host↔device round-trips amortize — per-
        # chunk dispatch cost ~8 RPCs, roughly half the full-DB eval's wall
        # time behind the dev relay. 0 disables (per-chunk dispatch).
        self.scan_chunks = int(scan_chunks)
        # resolved by evaluation(): "device" | "native" | "numpy"
        self.resolved_engine = ""
        self.possible_classes = set(spec.possible_classes("testing"))
        self.queries: List[VideoRecord] = db.nonnoise_queries()
        self.gallery_videos: List[VideoRecord] = db.gallery
        # per-phase wall-time accounting, populated by evaluation()
        self.timings: dict = {}

    def build_gallery(self):
        """→ feats [G,C], video_idx [G], start/end_sec [G], hit_label [G],
        hit_iou [G]."""
        cache = (
            self.extractor.load_cache("moment_gallery.npz") if self.read_cache else None
        )
        if cache is not None:
            return (
                cache["feats"],
                cache["video_idx"],
                cache["start_sec"],
                cache["end_sec"],
                cache["hit_label"],
                cache["hit_iou"],
            )
        with _phase(self.timings, "tape_build"):
            tapes = self.extractor.extract_video_tapes(self.gallery_videos)
        # Two passes with preallocated arenas: at production scale there are
        # ~10^6 moments, and per-block allocations pay this container's
        # pathological page-fault cost (see ops.segment_pool.HostWindowPooler).
        windows = []
        total = 0
        for video, tape in zip(self.gallery_videos, tapes):
            starts, ends, locs = enumerate_moment_windows(
                video.activitynet_duration,
                tape.shape[1],
                self.moment_clip_sec,
                self.max_clips,
                self.fps,
                self.temporal_stride,
            )
            windows.append((starts, ends, locs))
            total += len(starts)
        feat_dim = next((t.shape[0] for t in tapes if t.size), 0)
        feats = alloc_array((total, feat_dim), np.float32)
        vidx = np.empty(total, np.int64)
        s_sec = np.empty(total, np.float64)
        e_sec = np.empty(total, np.float64)
        h_iou = np.empty(total, np.float64)
        h_label = np.empty(total, object)
        pooler = HostWindowPooler()
        off = 0
        with _phase(self.timings, "window_pool"):
            for vi, (video, tape) in enumerate(zip(self.gallery_videos, tapes)):
                starts, ends, locs = windows[vi]
                w = len(starts)
                if w == 0:
                    continue
                pooler(tape, starts, ends, out=feats[off : off + w])
                vidx[off : off + w] = vi
                s_sec[off : off + w] = locs[:, 0]
                e_sec[off : off + w] = locs[:, 1]
                labels_v, ious_v = closest_hits_vectorized(
                    video.annotations, locs, self.possible_classes
                )
                h_label[off : off + w] = labels_v
                h_iou[off : off + w] = ious_v
                off += w
        log.info(
            "moment gallery: %d moments (%.1f / video)",
            total,
            total / max(len(self.gallery_videos), 1),
        )
        out = (feats, vidx, s_sec, e_sec, h_label.astype(str), h_iou)
        self.extractor.save_cache(
            "moment_gallery.npz",
            feats=out[0],
            video_idx=out[1],
            start_sec=out[2],
            end_sec=out[3],
            hit_label=out[4],
            hit_iou=out[5],
        )
        return out

    def _evaluation_device(
        self, queries, q_feats_all, feats, vidx, s_sec, e_sec, h_label, h_iou
    ) -> dict:
        """Device-engine ranking: scores never leave the device; per chunk the
        readback is one AP + R@N row per query (retrieval/moment_device.py).
        Metric-equal to the host postprocess (tested differentially and
        through the reference e2e fixtures)."""
        from vqwild_tpu.retrieval.moment_device import DeviceMomentEngine

        with _phase(self.timings, "engine_build"):
            engine = DeviceMomentEngine(
                vidx,
                s_sec,
                e_sec,
                h_label,
                h_iou,
                len(self.gallery_videos),
                nms_threshold=self.nms_threshold,
                tiou_threshold=self.tiou_threshold,
                chunk=min(self.rank_chunk, 32),
                max_ignore=max(8, 1 + self.multi_query_extra),
                mesh=self.mesh,
            )
        video_id_to_idx = {v.video_id: i for i, v in enumerate(self.gallery_videos)}
        expanded = generate_multi_query(
            list(range(len(queries))),
            label_of=lambda i: queries[i].label,
            video_id_of=lambda i: queries[i].video_id,
            extras=self.multi_query_extra,
        )
        log.info(
            "moment ranking (device engine): %d queries x %d moments",
            len(expanded),
            len(feats),
        )
        agg = MetricAggregator(self.r_at_n)
        agg.set_class_info(
            [(queries[qs[0]].label, queries[qs[0]].retrieval_type) for qs in expanded]
        )
        if self.mesh is None and self.scan_chunks > 0 and expanded:
            return self._device_scan_rank(
                engine, queries, expanded, q_feats_all, feats,
                video_id_to_idx, agg,
            )
        with _phase(self.timings, "gallery_to_device"):
            scorer = GalleryScorer(feats, mesh=self.mesh)
            # queries gather from a device-resident bank: per chunk only the
            # [B, query_num] i32 rows cross to device, not [B, D] features
            scorer.set_query_bank(q_feats_all.astype(np.float32, copy=False))
            jax.block_until_ready(scorer.g_dev)
        # bounded in-flight pipeline: keep up to `inflight` chunks dispatched
        # ahead of the readback cursor. Unbounded dispatch-then-readback made
        # the first finalize block silently behind the WHOLE device queue
        # (139 chunks x seconds of NMS at G~1.6e6 — the stall watchdog killed
        # a healthy full-DB run); a sliding window keeps the link busy, emits
        # steady progress, and bounds staged device outputs.
        inflight = 16
        staged: list = []
        read_cursor = 0

        def _finalize_one():
            nonlocal read_cursor
            batch, handle = staged[read_cursor]
            staged[read_cursor] = None  # free the device handles
            read_cursor += 1
            aps, recalls = engine.finalize(handle)
            if read_cursor % 8 == 0 or read_cursor == n_chunks:
                log.info("moment chunk %d/%d read back", read_cursor, n_chunks)
            for bi, qs in enumerate(batch):
                q = queries[qs[0]]
                agg.add(
                    q.label,
                    q.retrieval_type,
                    float(aps[bi]),
                    recalls[bi].tolist(),
                )

        n_chunks = -(-len(expanded) // engine.chunk)
        for cstart in range(0, len(expanded), engine.chunk):
            batch = expanded[cstart : cstart + engine.chunk]
            q_rows = np.full((len(batch), self.query_num), -1, np.int32)
            for bi, qs in enumerate(batch):
                take = qs[: self.query_num]
                q_rows[bi, : len(take)] = take
            q_labels = [engine.label_id(queries[qs[0]].label) for qs in batch]
            ignore_vids = [
                [
                    video_id_to_idx[queries[qi].video_id]
                    for qi in qs
                    if queries[qi].video_id in video_id_to_idx
                ]
                for qs in batch
            ]
            with _phase(self.timings, "score_device"):
                dev_scores = scorer.scores_from_bank(q_rows)
            with _phase(self.timings, "metrics_device"):
                staged.append(
                    (
                        batch,
                        engine.dispatch(
                            dev_scores,
                            q_labels,
                            ignore_vids,
                            self.r_at_n,
                            self.robust_map,
                        ),
                    )
                )
            if len(staged) % 8 == 0 or len(staged) == n_chunks:
                log.info("moment chunk %d/%d dispatched", len(staged), n_chunks)
            if len(staged) - read_cursor >= inflight:
                with _phase(self.timings, "metrics_readback"):
                    _finalize_one()
        with _phase(self.timings, "metrics_readback"):
            while read_cursor < len(staged):
                _finalize_one()
        return {"map05": agg.result()}

    def _device_scan_rank(
        self, engine, queries, expanded, q_feats_all, feats,
        video_id_to_idx, agg,
    ) -> dict:
        """Single-device rank loop with super-chunked dispatch: ``scan_chunks``
        query chunks run inside one program (moment_device._scan_metrics), so
        the full-DB eval costs ~n_chunks/scan_chunks dispatch+readback
        round-trips instead of ~8 RPCs per chunk. Tail chunks pad by
        replicating query 0; their outputs are dropped below."""
        b = engine.chunk
        qe = len(expanded)
        n_chunks = -(-qe // b)
        s_chunks = min(self.scan_chunks, n_chunks)
        n_prog = -(-n_chunks // s_chunks)
        total = n_prog * s_chunks * b
        q_rows = np.full((total, self.query_num), -1, np.int32)
        q_lab = np.zeros(total, np.int32)
        ig = np.full((total, engine.max_ignore), -1, np.int32)
        for i, qs in enumerate(expanded):
            take = qs[: self.query_num]
            q_rows[i, : len(take)] = take
            q_lab[i] = engine.label_id(queries[qs[0]].label)
            vids = [
                video_id_to_idx[queries[qi].video_id]
                for qi in qs
                if queries[qi].video_id in video_id_to_idx
            ]
            if len(vids) > engine.max_ignore:
                raise ValueError(
                    f"{len(vids)} ignore videos > {engine.max_ignore}"
                )
            ig[i, : len(vids)] = vids
        if total > qe:
            q_rows[qe:] = q_rows[0]
            q_lab[qe:] = q_lab[0]
            ig[qe:] = ig[0]
        q_rows = q_rows.reshape(n_prog, s_chunks, b, self.query_num)
        q_lab = q_lab.reshape(n_prog, s_chunks, b)
        ig = ig.reshape(n_prog, s_chunks, b, engine.max_ignore)
        bank_shape = (q_feats_all.shape[0], feats.shape[1])
        with _phase(self.timings, "compile_warm"):
            engine.warm_scan(
                bank_shape, feats.shape, s_chunks, self.query_num,
                self.r_at_n, self.robust_map,
            )
        log.info(
            "scan program warmed in %.1fs (%d programs x %d chunks x %d queries)",
            self.timings["compile_warm"], n_prog, s_chunks, b,
        )
        with _phase(self.timings, "gallery_to_device"):
            scorer = GalleryScorer(feats, mesh=None)
            scorer.set_query_bank(q_feats_all.astype(np.float32, copy=False))
            jax.block_until_ready(scorer.g_dev)
        # bounded in-flight pipeline over programs (see _evaluation_device)
        inflight = 2
        staged: list = []
        read_cursor = 0

        def _finalize_one():
            nonlocal read_cursor
            p = read_cursor
            handle = staged[p]
            staged[p] = None  # free the device handles
            read_cursor += 1
            aps, recalls = engine.finalize_scan(handle)
            log.info("moment program %d/%d read back", read_cursor, n_prog)
            base = p * s_chunks * b
            for j in range(min(len(aps), qe - base)):
                q = queries[expanded[base + j][0]]
                agg.add(
                    q.label,
                    q.retrieval_type,
                    float(aps[j]),
                    recalls[j].tolist(),
                )

        for p in range(n_prog):
            with _phase(self.timings, "metrics_device"):
                staged.append(
                    engine.dispatch_scan(
                        scorer.q_bank, scorer.g_dev,
                        q_rows[p], q_lab[p], ig[p],
                        self.r_at_n, self.robust_map,
                    )
                )
            log.info("moment program %d/%d dispatched", p + 1, n_prog)
            if len(staged) - read_cursor >= inflight:
                with _phase(self.timings, "metrics_readback"):
                    _finalize_one()
        with _phase(self.timings, "metrics_readback"):
            while read_cursor < len(staged):
                _finalize_one()
        return {"map05": agg.result()}

    def evaluation(self) -> dict:
        with _phase(self.timings, "query_feats"):
            q_feats_all = self.extractor.extract_trimmed(self.queries)
        pool = self.queries[: q_feats_all.shape[0]]  # capped in debug
        keep = [i for i, q in enumerate(pool) if q.label in self.possible_classes]
        queries = [pool[i] for i in keep]
        q_feats_all = q_feats_all[keep]

        feats, vidx, s_sec, e_sec, h_label, h_iou = self.build_gallery()
        gal_video_ids = np.array([self.gallery_videos[v].video_id for v in vidx])

        use_device = self.engine == "device" or (
            self.engine == "auto"
            and not self.collect_diagnostics
            and len(feats) > 0
            # the device engine exists to avoid the [Q, ~10^6] score
            # readback over a device link; on the CPU backend there is no
            # link to avoid and its padded-bucket NMS costs ~5x the
            # native/numpy host postprocess at production scale
            # (benchmarks/EVAL_SCALE_r04_cpu.json: 815 s vs r03's 156 s
            # at 128 queries) — only auto-select it on accelerators
            and jax.default_backend() != "cpu"
        )
        if use_device and len(feats):
            # device-engine hard limit: its widest NMS bucket holds 16,384
            # moments per video (moment_device._BUCKET_WIDTHS; the real
            # 100_20_80 untrimmed DB maxes at 3,549 windows/video, p99 897 —
            # a ~47-minute video would cross it). Oversize videos fall back
            # to the host postprocess instead of raising.
            max_per_video = int(np.bincount(vidx).max()) if len(vidx) else 0
            if max_per_video > 16384:
                log.warning(
                    "device moment engine disabled: a video has %d moments "
                    "> the 16384 bucket cap; falling back to the host "
                    "postprocess",
                    max_per_video,
                )
                use_device = False
        if use_device:
            self.resolved_engine = "device"
            return self._evaluation_device(
                queries, q_feats_all, feats, vidx, s_sec, e_sec, h_label, h_iou
            )

        try:
            from vqwild_tpu.native import lib as native_lib

            use_native = native_lib.available()
        except ImportError:
            use_native = False
        # the native engine returns only ap/recalls; diagnostics need the
        # per-query kept stream, so they ride the numpy/thread path
        use_native = use_native and not self.collect_diagnostics
        self.resolved_engine = "native" if use_native else "numpy"
        if use_native:
            label_ids = {"": -1}
            for lab in list(h_label) + [q.label for q in queries]:
                label_ids.setdefault(lab, len(label_ids))
            hit_label_ids = np.array([label_ids[l] for l in h_label], np.int32)
            video_id_to_idx = {
                v.video_id: i for i, v in enumerate(self.gallery_videos)
            }
            log.info("moment postprocess: native engine, %d threads", self.workers)

        expanded = generate_multi_query(
            list(range(len(queries))),
            label_of=lambda i: queries[i].label,
            video_id_of=lambda i: queries[i].video_id,
            extras=self.multi_query_extra,
        )
        log.info(
            "moment ranking: %d queries x %d moments", len(expanded), len(feats)
        )
        agg = MetricAggregator(self.r_at_n)
        agg.set_class_info(
            [(queries[qs[0]].label, queries[qs[0]].retrieval_type) for qs in expanded]
        )
        # upstream's multiprocessing moment path bypasses add2dict and
        # collects no diagnostics (:386-402); the rebuild fills the full
        # payload over the kept grouped-order stream (retrieval/diagnostics.py)
        diag = DiagnosticsCollector(self.robust_map) if self.collect_diagnostics else None

        with _phase(self.timings, "gallery_to_device"):
            scorer = GalleryScorer(feats, mesh=self.mesh)
            jax.block_until_ready(scorer.g_dev)
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=self.workers)
        try:
            for cstart in range(0, len(expanded), self.rank_chunk):
                batch = expanded[cstart : cstart + self.rank_chunk]
                qf = np.stack(
                    [
                        np.mean([q_feats_all[i] for i in qs[: self.query_num]], axis=0)
                        for qs in batch
                    ]
                )
                bf16 = self.score_readback_dtype == "bfloat16"
                with _phase(self.timings, "score_device"):
                    dev_scores = scorer.scores(
                        qf, out_dtype=jnp.bfloat16 if bf16 else None
                    )
                    jax.block_until_ready(dev_scores)
                with _phase(self.timings, "score_readback"):
                    scores = np.asarray(dev_scores)[:, : scorer.n]
                    if bf16:  # postprocess consumes fp32 (host widen is cheap)
                        scores = scores.astype(np.float32)
                del dev_scores

                if use_native:
                    max_ig = max(len(qs) for qs in batch)
                    ignore_vids = np.full((len(batch), max_ig), -1, np.int32)
                    q_label_ids = np.empty(len(batch), np.int32)
                    for bi, qs in enumerate(batch):
                        q_label_ids[bi] = label_ids[queries[qs[0]].label]
                        k = 0  # compact: -1 is the terminator sentinel
                        for qi in qs:
                            gidx = video_id_to_idx.get(queries[qi].video_id)
                            if gidx is not None:
                                ignore_vids[bi, k] = gidx
                                k += 1
                    with _phase(self.timings, "postprocess"):
                        aps, recalls = native_lib.moment_batch(
                            scores,
                            vidx,
                            s_sec,
                            e_sec,
                            hit_label_ids,
                            h_iou,
                            q_label_ids,
                            ignore_vids,
                            self.nms_threshold,
                            self.tiou_threshold,
                            self.r_at_n,
                            self.robust_map,
                            n_threads=self.workers,
                        )
                    for bi, qs in enumerate(batch):
                        q = queries[qs[0]]
                        agg.add(
                            q.label,
                            q.retrieval_type,
                            float(aps[bi]),
                            recalls[bi].tolist(),
                        )
                    continue

                def one(bi_qs):
                    bi, qs = bi_qs
                    q = queries[qs[0]]
                    iou_q = np.where(h_label == q.label, h_iou, 0.0)
                    ignore_q = np.isin(
                        gal_video_ids, [queries[i].video_id for i in qs]
                    )
                    out = moment_query_metrics(
                        scores[bi],
                        vidx,
                        s_sec,
                        e_sec,
                        iou_q,
                        ignore_q,
                        self.nms_threshold,
                        self.tiou_threshold,
                        self.r_at_n,
                        self.robust_map,
                        return_diag=diag is not None,
                    )
                    return (q,) + tuple(out)

                t_post = time.perf_counter()
                for res in pool.map(one, enumerate(batch)):
                    q, ap, recalls = res[0], res[1], res[2]
                    agg.add(q.label, q.retrieval_type, ap, recalls)
                    if diag is not None:
                        d = res[3]
                        top = d["valid"][:100]
                        diag.add(
                            gt_label=q.label,
                            retrieval_type=q.retrieval_type,
                            duration_sec=q.duration_sec,
                            ap=float(ap),
                            y_true=d["tp"],
                            y_pred=d["scores"],
                            top_labels=[str(h_label[g]) for g in top],
                            top30_items=[
                                dict(
                                    video_id=str(gal_video_ids[g]),
                                    loc=[float(s_sec[g]), float(e_sec[g])],
                                    hit_label=str(h_label[g]),
                                    hit_iou=float(h_iou[g]),
                                )
                                for g in top[:30]
                            ],
                        )
                self.timings["postprocess"] = self.timings.get(
                    "postprocess", 0.0
                ) + (time.perf_counter() - t_post)
        finally:
            pool.shutdown()
        result = agg.result()
        if diag is not None:
            result["cm_dict"] = diag.finalize(agg, result)
        return {"map05": result}
