"""Mesh-sharded gallery scoring.

The gallery feature matrix shards row-wise over the mesh's ``data`` axis
(queries replicate); the per-chunk ``[Q, G]`` score matmul then runs one
gallery shard per device and XLA concatenates shard scores over ICI — the
multi-chip form of the FAISS replacement (SURVEY §2.6/§7). Gallery rows are
edge-padded to the shard multiple; padded columns are masked as ``ignore`` so
metrics are bit-identical to the single-device path (tested on the 8-device
CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqwild_tpu.core.transfer import chunked_device_put
from vqwild_tpu.ops.distance import _use_pallas, score_matrix
from vqwild_tpu.ops.ranking import (
    fused_chunk_metrics,
    fused_eval_metrics,
    gather_scores,
)
from vqwild_tpu.parallel.mesh import pad_to_multiple

_bank_scores = functools.partial(
    jax.jit, static_argnames=("use_pallas",)
)(gather_scores)

# process-wide AOT executables for the fused chunk program, keyed by every
# shape/option that shapes the HLO (single-device path; mesh-sharded
# programs cache per-scorer because their avals carry shardings)
_COMPILED_CHUNKS: dict = {}


def warm_fused_chunk(
    bank_shape,
    gallery_rows: int,
    b: int,
    query_num: int,
    k_src: int,
    r_at_n,
    robust: bool,
    topk: int,
    full_rank: bool,
):
    """AOT-compile the fused chunk program from avals alone (no data moves,
    no device arrays needed) and cache the executable process-wide.

    Compiling BEFORE the gallery upload matters behind the dev relay: a
    200 MB upload immediately preceding the compile RPC is the observed
    recipe for wedging the multiplexed stream; aval-based warm lets the
    evaluator order compile → upload → loop."""
    d = bank_shape[1]
    key = (
        tuple(bank_shape),
        gallery_rows,
        b,
        query_num,
        k_src,
        tuple(r_at_n),
        robust,
        topk,
        full_rank,
    )
    if key in _COMPILED_CHUNKS:
        return _COMPILED_CHUNKS[key]
    sd = jax.ShapeDtypeStruct
    compiled = fused_chunk_metrics.lower(
        sd(tuple(bank_shape), np.float32),
        sd((gallery_rows, d), np.float32),
        sd((gallery_rows,), np.int32),
        sd((gallery_rows,), np.int32),
        sd((b, query_num), np.int32),
        sd((b,), np.int32),
        sd((b, k_src), np.int32),
        r_at_n=tuple(r_at_n),
        robust=robust,
        topk=topk,
        full_rank=full_rank,
        use_pallas=False,
    ).compile()
    _COMPILED_CHUNKS[key] = compiled
    return compiled


def stack_query_chunks(
    expanded,
    rank_chunk: int,
    query_num: int,
    k_src: int,
    label_id_of,
    src_vids_of,
):
    """Batch every expanded query list into the stacked chunk arrays the
    whole-eval program consumes (fused_eval_metrics).

    → (q_rows [n_chunks, B, query_num], q_label_ids [n_chunks, B],
    q_src_vids [n_chunks, B, k_src]). The tail chunk pads by replicating
    query 0 — real, valid inputs whose outputs the caller drops (index ≥
    len(expanded) after flattening) — because -1 rows would NaN the
    masked-mean feature gather. ``label_id_of(i)``/``src_vids_of(qs)`` map a
    query index / expanded list to its label id and source-video id list.
    """
    qe = len(expanded)
    assert qe > 0
    b = min(rank_chunk, qe)
    n_chunks = (qe + b - 1) // b
    total = n_chunks * b
    q_rows = np.full((total, query_num), -1, np.int32)
    q_src = np.full((total, k_src), -2, np.int32)
    q_lab = np.zeros(total, np.int32)
    for i, qs in enumerate(expanded):
        take = qs[:query_num]
        q_rows[i, : len(take)] = take
        q_lab[i] = label_id_of(qs[0])
        q_src[i, : len(qs)] = src_vids_of(qs)
    if total > qe:
        q_rows[qe:] = q_rows[0]
        q_lab[qe:] = q_lab[0]
        q_src[qe:] = q_src[0]
    return (
        q_rows.reshape(n_chunks, b, query_num),
        q_lab.reshape(n_chunks, b),
        q_src.reshape(n_chunks, b, k_src),
    )


def warm_fused_eval(
    bank_shape,
    gallery_rows: int,
    n_chunks: int,
    b: int,
    query_num: int,
    k_src: int,
    r_at_n,
    robust: bool,
):
    """AOT-compile the whole-eval lax.map program from avals (see
    warm_fused_chunk for why this happens before the gallery upload)."""
    d = bank_shape[1]
    key = (
        "eval",
        tuple(bank_shape),
        gallery_rows,
        n_chunks,
        b,
        query_num,
        k_src,
        tuple(r_at_n),
        robust,
    )
    if key in _COMPILED_CHUNKS:
        return _COMPILED_CHUNKS[key]
    sd = jax.ShapeDtypeStruct
    compiled = fused_eval_metrics.lower(
        sd(tuple(bank_shape), np.float32),
        sd((gallery_rows, d), np.float32),
        sd((gallery_rows,), np.int32),
        sd((gallery_rows,), np.int32),
        sd((n_chunks, b, query_num), np.int32),
        sd((n_chunks, b), np.int32),
        sd((n_chunks, b, k_src), np.int32),
        r_at_n=tuple(r_at_n),
        robust=robust,
    ).compile()
    _COMPILED_CHUNKS[key] = compiled
    return compiled


class GalleryScorer:
    """Holds the (optionally sharded) gallery on device; scores query chunks."""

    def __init__(self, gallery_feats: np.ndarray, mesh: Optional[Mesh] = None,
                 axis="data"):
        """``axis``: mesh axis name, or a tuple of names to shard the gallery
        rows over several axes jointly — e.g. ``("data", "model")`` reuses
        the 2-axis training mesh for eval with every device holding a row
        shard, instead of rebuilding a 1-axis mesh between phases."""
        self.n = gallery_feats.shape[0]
        self.mesh = mesh
        if mesh is not None:
            axes = (axis,) if isinstance(axis, str) else tuple(axis)
            n_shards = 1
            for a in axes:
                n_shards *= mesh.shape[a]
            padded, _ = pad_to_multiple(np.asarray(gallery_feats), n_shards)
            self.n_padded = padded.shape[0]
            spec = P(axes[0] if len(axes) == 1 else axes)
            self._row_sharding = NamedSharding(mesh, spec)
            self.g_dev = jax.device_put(padded, self._row_sharding)
            self._q_sharding = NamedSharding(mesh, P())  # queries replicate
        else:
            self.n_padded = self.n
            self.g_dev = chunked_device_put(np.asarray(gallery_feats))
            self._row_sharding = None
            self._q_sharding = None
        self._col_label_ids = None
        self._col_vid_ids = None
        self._q_bank = None
        self._warmed = {}

    @property
    def q_bank(self):
        """Device-resident query-feature bank (set_query_bank)."""
        assert self._q_bank is not None, "set_query_bank() first"
        return self._q_bank

    # ---- device-resident eval state (id-based mask path) ----

    def set_columns(self, label_ids: np.ndarray, vid_ids: np.ndarray):
        """Upload per-gallery-item label/video ids once ([G] i32, ≥0).

        Padded rows get -1 so build_eval_masks force-ignores them; ids shard
        with the gallery rows so the per-shard mask math stays local."""
        assert label_ids.shape == vid_ids.shape == (self.n,)

        def _pad(a):
            a = np.asarray(a, np.int32)
            if self.n_padded > self.n:
                a = np.concatenate(
                    [a, np.full(self.n_padded - self.n, -1, np.int32)]
                )
            if self._row_sharding is not None:
                return jax.device_put(a, self._row_sharding)
            return jnp.asarray(a)

        self._col_label_ids = _pad(label_ids)
        self._col_vid_ids = _pad(vid_ids)

    def set_query_bank(self, feats: Optional[np.ndarray]):
        """Upload the query-feature bank once (replicated). ``None`` means
        queries are gallery rows (trimmed eval) — the bank is the gallery
        itself, so gathers stay shard-local only in the replicated case;
        with a row-sharded gallery XLA inserts the gather's all-gather."""
        if feats is None:
            self._q_bank = self.g_dev
        elif self._q_sharding is not None:
            self._q_bank = jax.device_put(
                np.asarray(feats, np.float32), self._q_sharding
            )
        else:
            self._q_bank = chunked_device_put(np.asarray(feats, np.float32))

    def chunk_metrics(
        self,
        q_rows: np.ndarray,
        q_label_ids: np.ndarray,
        q_src_vids: np.ndarray,
        r_at_n=(30, 50, 100),
        robust: bool = True,
        topk: int = 0,
        full_rank: bool = False,
    ):
        """One fused device dispatch for a query chunk (see
        ops.ranking.fused_chunk_metrics). q_rows [B,query_num] i32 rows into
        the query bank; q_label_ids [B] i32; q_src_vids [B,K] i32 (pad -2).

        The distance term uses the XLA expansion, not the Pallas kernel:
        embedding the pallas_call in this larger program blows XLA:TPU
        compile time 30x+ (190 s vs 6 s at [256, 7670]; unbounded at
        [256, 10^5]) while the expansion hits the MXU identically and fuses
        with the downstream metric math. Pallas stays on the standalone
        ``scores`` path where it compiles in <1 s."""
        assert self._col_label_ids is not None, "set_columns() first"
        assert self._q_bank is not None, "set_query_bank() first"
        up = lambda a: (
            jax.device_put(a, self._q_sharding)
            if self._q_sharding is not None
            else jnp.asarray(a)
        )
        q_rows = np.asarray(q_rows, np.int32)
        q_label_ids = np.asarray(q_label_ids, np.int32)
        q_src_vids = np.asarray(q_src_vids, np.int32)
        key = (
            q_rows.shape[0],
            q_rows.shape[1],
            q_src_vids.shape[1],
            tuple(r_at_n),
            robust,
            topk,
            full_rank,
        )
        compiled = self._warmed.get(key)
        if compiled is not None:
            return compiled(
                self._q_bank,
                self.g_dev,
                self._col_label_ids,
                self._col_vid_ids,
                up(q_rows),
                up(q_label_ids),
                up(q_src_vids),
            )
        return fused_chunk_metrics(
            self._q_bank,
            self.g_dev,
            self._col_label_ids,
            self._col_vid_ids,
            up(q_rows),
            up(q_label_ids),
            up(q_src_vids),
            r_at_n=tuple(r_at_n),
            robust=robust,
            topk=topk,
            full_rank=full_rank,
            use_pallas=False,
        )

    def eval_metrics_all(
        self,
        q_rows: np.ndarray,
        q_label_ids: np.ndarray,
        q_src_vids: np.ndarray,
        r_at_n=(30, 50, 100),
        robust: bool = True,
    ):
        """One device dispatch for EVERY query chunk (ops.ranking.
        fused_eval_metrics): q_rows [n_chunks, B, query_num] etc. Returns the
        device dict; callers jax.device_get once. The tail chunk must be
        padded with replicated VALID queries (extras dropped host-side)."""
        assert self._col_label_ids is not None, "set_columns() first"
        assert self._q_bank is not None, "set_query_bank() first"
        up = lambda a: (
            jax.device_put(a, self._q_sharding)
            if self._q_sharding is not None
            else jnp.asarray(a)
        )
        q_rows = np.asarray(q_rows, np.int32)
        q_label_ids = np.asarray(q_label_ids, np.int32)
        q_src_vids = np.asarray(q_src_vids, np.int32)
        key = ("eval", q_rows.shape, q_src_vids.shape[2], tuple(r_at_n), robust)
        compiled = self._warmed.get(key)
        args = (
            self._q_bank,
            self.g_dev,
            self._col_label_ids,
            self._col_vid_ids,
            up(q_rows),
            up(q_label_ids),
            up(q_src_vids),
        )
        if compiled is not None:
            return compiled(*args)
        return fused_eval_metrics(*args, r_at_n=tuple(r_at_n), robust=robust)

    def warm_eval_metrics(
        self,
        n_chunks: int,
        b: int,
        query_num: int,
        k_src: int,
        r_at_n=(30, 50, 100),
        robust: bool = True,
    ):
        """AOT-compile the whole-eval program (see warm_chunk_metrics)."""
        assert self._q_bank is not None and self._col_label_ids is not None
        key = (
            "eval",
            (n_chunks, b, query_num),
            k_src,
            tuple(r_at_n),
            robust,
        )
        if key in self._warmed:
            return
        if self.mesh is None:
            self._warmed[key] = warm_fused_eval(
                self._q_bank.shape,
                self.n_padded,
                n_chunks,
                b,
                query_num,
                k_src,
                r_at_n,
                robust,
            )
            return
        sd = jax.ShapeDtypeStruct
        self._warmed[key] = fused_eval_metrics.lower(
            self._q_bank,
            self.g_dev,
            self._col_label_ids,
            self._col_vid_ids,
            sd((n_chunks, b, query_num), np.int32),
            sd((n_chunks, b), np.int32),
            sd((n_chunks, b, k_src), np.int32),
            r_at_n=tuple(r_at_n),
            robust=robust,
        ).compile()

    def warm_chunk_metrics(
        self,
        b: int,
        query_num: int,
        k_src: int,
        r_at_n=(30, 50, 100),
        robust: bool = True,
        topk: int = 0,
        full_rank: bool = False,
    ):
        """AOT-compile the fused chunk program for one (b, query_num, k_src)
        shape and keep the executable; ``chunk_metrics`` then calls it
        directly. This keeps the rank loop free of compile stalls: the AOT
        path compiles the same program reliably in seconds where the
        dispatch-path compile has been observed 15x slower behind the dev
        relay, and the executable also lands in the persistent compile
        cache for later processes.

        Single-device scorers delegate to the aval-based module cache (also
        reachable BEFORE any upload via ``warm_fused_chunk``); mesh-sharded
        scorers lower from their concrete sharded arrays per instance."""
        assert self._q_bank is not None and self._col_label_ids is not None
        key = (b, query_num, k_src, tuple(r_at_n), robust, topk, full_rank)
        if key in self._warmed:
            return
        if self.mesh is None:
            self._warmed[key] = warm_fused_chunk(
                self._q_bank.shape,
                self.n_padded,
                b,
                query_num,
                k_src,
                r_at_n,
                robust,
                topk,
                full_rank,
            )
            return
        sd = jax.ShapeDtypeStruct
        self._warmed[key] = fused_chunk_metrics.lower(
            self._q_bank,
            self.g_dev,
            self._col_label_ids,
            self._col_vid_ids,
            sd((b, query_num), np.int32),
            sd((b,), np.int32),
            sd((b, k_src), np.int32),
            r_at_n=tuple(r_at_n),
            robust=robust,
            topk=topk,
            full_rank=full_rank,
            use_pallas=False,
        ).compile()

    def pad_columns(self, tp: np.ndarray, ignore: np.ndarray):
        """Extend per-query tp/ignore to padded gallery width (pads ignored)."""
        extra = self.n_padded - self.n
        if extra == 0:
            return tp, ignore
        tp = np.concatenate([tp, np.zeros((tp.shape[0], extra), bool)], axis=1)
        ignore = np.concatenate(
            [ignore, np.ones((ignore.shape[0], extra), bool)], axis=1
        )
        return tp, ignore

    def scores_from_bank(self, q_rows: np.ndarray):
        """[B, query_num] i32 rows (pad -1) → [B, n_padded] scores (device).

        Like ``scores`` but the query features are gathered (masked mean)
        from the device-resident bank, so the per-chunk upload is the i32
        row index array instead of the [B, D] f32 features."""
        assert self._q_bank is not None, "set_query_bank() first"
        rows = np.asarray(q_rows, np.int32)
        if self._q_sharding is not None:
            rows = jax.device_put(rows, self._q_sharding)
        # XLA expansion, not pallas: same compile-blowup rationale as
        # chunk_metrics (the gather composes into the program)
        return _bank_scores(self._q_bank, self.g_dev, rows, use_pallas=False)

    def scores(self, qfeats: np.ndarray, out_dtype=None):
        """[B, D] queries → [B, n_padded] scores (device array).

        ``out_dtype`` casts on device before any host readback — shipping
        bf16 halves the device→host score bytes, which dominates moment
        eval behind a slow link (measured 226 s of a 334 s run for
        128×1.64M fp32 scores through the dev relay;
        benchmarks/EVAL_SCALE_r03_tpu_moment.json)."""
        q = jnp.asarray(qfeats)
        if self._q_sharding is not None:
            q = jax.device_put(q, self._q_sharding)
        s = score_matrix(q, self.g_dev)
        if out_dtype is not None:
            s = s.astype(out_dtype)
        return s
