"""The serving gallery index: clip embeddings + metadata, on device.

Wraps retrieval.sharded.GalleryScorer (the FAISS-replacement scoring path,
SURVEY §2.9) with persistence and device top-k, so a server process can load
a prebuilt index and answer queries without touching the frame store.

Replaces nothing upstream (the reference re-extracts features per eval run,
dataloader_baseline.py:1450-1456); the on-disk format reuses the same
memmap-friendly layout as the feature caches.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vqwild_tpu.core.logging import get_logger
from vqwild_tpu.data.schema import VideoRecord
from vqwild_tpu.retrieval.sharded import GalleryScorer

log = get_logger("serve.index")

_META_KEYS = ("video_id", "label", "retrieval_type")


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_scores(scores, k: int):
    return jax.lax.top_k(scores, k)


class GalleryIndex:
    """[N, C] fp32 clip embeddings + per-row metadata, scored on device."""

    def __init__(self, feats: np.ndarray, meta: List[dict], mesh=None):
        assert feats.ndim == 2 and feats.shape[0] == len(meta), (
            feats.shape, len(meta),
        )
        self.meta = meta
        self.scorer = GalleryScorer(np.ascontiguousarray(feats, np.float32), mesh=mesh)
        self.n = self.scorer.n

    # ---- construction ----

    @classmethod
    def build(cls, records: Sequence[VideoRecord], extractor, mesh=None,
              temporal_mean: bool = True) -> "GalleryIndex":
        """Embed trimmed records through the extractor (frame features
        [N, C, T] → temporal-mean clip embeddings, main.py:220-233)."""
        feats = extractor.extract_trimmed(list(records))
        if temporal_mean and feats.ndim == 3:
            feats = feats.mean(axis=2)
        meta = [
            {k: getattr(r, k) for k in _META_KEYS} for r in records[: feats.shape[0]]
        ]
        return cls(np.asarray(feats, np.float32), meta, mesh=mesh)

    # ---- persistence ----

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        feats = np.asarray(jax.device_get(self.scorer.g_dev))[: self.n]
        tmp = os.path.join(path, ".feats.tmp.npy")
        np.save(tmp, feats)
        os.replace(tmp, os.path.join(path, "feats.npy"))
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(self.meta, f)
        log.info("saved gallery index (%d rows) to %s", self.n, path)

    @classmethod
    def load(cls, path: str, mesh=None) -> "GalleryIndex":
        feats = np.load(os.path.join(path, "feats.npy"), mmap_mode="r")
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(np.asarray(feats), meta, mesh=mesh)

    # ---- queries ----

    def topk(self, qfeats: np.ndarray, k: int = 30):
        """[B, C] query embeddings → (scores [B, k], rows [B, k]).

        Scores are −‖q−g‖² (higher = closer), the reference's FAISS
        convention (dataloader_baseline.py:1599-1604). Padded gallery rows
        (mesh shard alignment) are masked out before the device top-k.
        """
        k = min(k, self.n)
        scores = self.scorer.scores(np.asarray(qfeats, np.float32))
        if self.scorer.n_padded > self.n:
            pad = self.scorer.n_padded - self.n
            mask = jnp.concatenate(
                [jnp.zeros((self.n,)), jnp.full((pad,), -jnp.inf)]
            )
            scores = scores + mask[None, :]
        top_s, top_i = _topk_scores(scores, k)
        return np.asarray(top_s), np.asarray(top_i)

    def lookup(self, rows: Sequence[int]) -> List[dict]:
        return [self.meta[int(r)] for r in rows]
