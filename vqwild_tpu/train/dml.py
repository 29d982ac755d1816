"""Deep-metric-learning loss zoo (reference misc_utils/metric_learning_loss.py).

Upstream vendors the Roth & Brattoli DML library but never wires it into the
active training path (SURVEY §2.5) — it is preserved here as an available
loss library, restructured TPU-first:

* **Samplers run on host** (they are data-dependent index selection, exactly
  as upstream runs them on detached tensors): random / semihard / distance-
  weighted triplet samplers and the npair sampler return index arrays.
* **Losses are pure jittable functions** of (embeddings, index arrays):
  the upstream per-triplet Python loops become batched gathers, so the loss
  math lands on the VPU/MXU regardless of triplet count.
* Trainable extras (MarginLoss per-class β, ProxyNCA proxies) are explicit
  parameter pytrees owned by the caller's optimizer state.

Semantics notes (vs upstream): TripletLoss uses *squared* L2 (FaceNet form,
:343-355); MarginLoss uses true L2 with 1e-8 under the sqrt and normalizes by
the count of active pairs (:524-566); ProxyNCA multiplies normalized
embeddings and proxies by 3 (:604-605); NPair adds an l2 weight penalty on
anchor+positive only (:421-431).
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# host-side samplers
# --------------------------------------------------------------------------


def _pdist(batch: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    prod = batch @ batch.T
    norm = np.diag(prod)[:, None]
    sq = np.clip(norm + norm.T - 2 * prod, 0, None)
    return np.sqrt(np.clip(sq, eps, None))


def random_triplets(
    batch: np.ndarray, labels: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """All valid (a,p,n) triples enumerated, then len(batch) sampled
    (metric_learning_loss.py:113-148)."""
    labels = np.asarray(labels)
    unique = np.unique(labels)
    indices = np.arange(len(labels))
    class_idx = {c: indices[labels == c] for c in unique}
    triplets = []
    for a_cls in unique:
        for n_cls in unique:
            if a_cls == n_cls:
                continue
            for a, p, n in itertools.product(
                class_idx[a_cls], class_idx[a_cls], class_idx[n_cls]
            ):
                if a != p:
                    triplets.append((a, p, n))
    if not triplets:
        raise ValueError("batch has no valid triplets")
    sel = rng.choice(len(triplets), size=len(labels), replace=len(triplets) < len(labels))
    return np.asarray([triplets[i] for i in sel], np.int32)


def semihard_triplets(
    batch: np.ndarray, labels: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Per-anchor semihard positive/negative selection (:150-196)."""
    labels = np.asarray(labels)
    d = _pdist(batch)
    triplets = []
    for i in range(len(labels)):
        pos = labels == labels[i]
        pos[i] = False
        neg = ~(labels == labels[i])
        if not pos.any() or not neg.any():
            continue
        neg_mask = neg & (d[i] < d[i][pos].max())
        pos_mask = pos & (d[i] > d[i][neg].min())
        p = rng.choice(np.where(pos_mask if pos_mask.any() else pos)[0])
        n = rng.choice(np.where(neg_mask if neg_mask.any() else neg)[0])
        triplets.append((i, p, n))
    return np.asarray(triplets, np.int32)


def distance_weighted_triplets(
    batch: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    lower_cutoff: float = 0.5,
) -> np.ndarray:
    """'Sampling Matters in Deep Embedding Learning' negatives (:198-238,
    inverse sphere distances :291-324)."""
    labels = np.asarray(labels)
    bs, dim = batch.shape
    d = np.clip(_pdist(batch), lower_cutoff, None)
    triplets = []
    for i in range(bs):
        pos = labels == labels[i]
        pos[i] = False
        if not pos.any() or pos.sum() == bs - 1:
            continue
        log_q = (2.0 - dim) * np.log(d[i]) - ((dim - 3) / 2.0) * np.log(
            np.clip(1.0 - 0.25 * d[i] ** 2, 1e-12, None)
        )
        log_q[labels == labels[i]] = 0.0
        q = np.exp(log_q - log_q.max())
        q[labels == labels[i]] = 0.0
        q = q / q.sum()
        p = rng.choice(np.where(pos)[0])
        n = rng.choice(bs, p=q)
        triplets.append((i, p, n))
    return np.asarray(triplets, np.int32)


def npair_tuples(
    labels: np.ndarray, rng: np.random.Generator
) -> Optional[np.ndarray]:
    """[K, 2+K-1] rows (anchor, positive, negatives — one positive of every
    other class), K = #classes with ≥2 samples (:240-274)."""
    labels = np.asarray(labels)
    label_set, counts = np.unique(labels, return_counts=True)
    label_set = label_set[counts >= 2]
    if len(label_set) < 2:
        return None
    pos_pairs = np.array(
        [rng.choice(np.where(labels == c)[0], 2, replace=False) for c in label_set]
    )
    rows = []
    for idx, (a, p) in enumerate(pos_pairs):
        negs = pos_pairs[np.delete(np.arange(len(pos_pairs)), idx), 1]
        rows.append([a, p, *negs.tolist()])
    return np.asarray(rows, np.int32)


SAMPLERS = {
    "random": random_triplets,
    "semihard": semihard_triplets,
    "distance": distance_weighted_triplets,
}


# --------------------------------------------------------------------------
# jittable losses
# --------------------------------------------------------------------------


@jax.jit
def triplet_loss(batch, triplets, margin: float = 1.0):
    """FaceNet triplet loss on squared L2 (:329-379), mean over triplets."""
    a = batch[triplets[:, 0]]
    p = batch[triplets[:, 1]]
    n = batch[triplets[:, 2]]
    d_ap = jnp.sum((a - p) ** 2, axis=-1)
    d_an = jnp.sum((a - n) ** 2, axis=-1)
    return jnp.mean(jax.nn.relu(d_ap - d_an + margin))


@jax.jit
def npair_loss(batch, npairs, l2: float = 0.02):
    """Multi-class N-pair loss + l2 penalty on anchors/positives (:384-457)."""
    a = batch[npairs[:, 0]]  # [K, D]
    p = batch[npairs[:, 1]]
    negs = batch[npairs[:, 2:]]  # [K, K-1, D]
    inner = jnp.einsum("kd,knd->kn", a, negs - p[:, None, :])
    loss = jnp.log1p(jnp.sum(jnp.exp(inner), axis=1)).mean()
    penalty = jnp.mean(jnp.sum(a**2 + p**2, axis=-1))
    return loss + l2 * penalty


def margin_loss(batch, triplets, anchor_classes, beta, margin: float = 0.2, nu: float = 0.0):
    """'Sampling Matters' margin loss with (optionally trainable) per-class β
    (:462-566). ``beta``: scalar or [n_classes] array; ``anchor_classes``:
    class id per triplet anchor."""
    a = batch[triplets[:, 0]]
    p = batch[triplets[:, 1]]
    n = batch[triplets[:, 2]]
    d_ap = jnp.sqrt(jnp.sum((a - p) ** 2, axis=-1) + 1e-8)
    d_an = jnp.sqrt(jnp.sum((a - n) ** 2, axis=-1) + 1e-8)
    b = beta[anchor_classes] if jnp.ndim(beta) > 0 else beta
    pos_loss = jax.nn.relu(d_ap - b + margin)
    neg_loss = jax.nn.relu(b - d_an + margin)
    pair_count = jnp.sum((pos_loss > 0) | (neg_loss > 0)).astype(batch.dtype)
    total = jnp.sum(pos_loss + neg_loss)
    loss = jnp.where(pair_count == 0, total, total / jnp.maximum(pair_count, 1.0))
    if nu:
        loss = loss + nu * jnp.sum(b)
    return loss


@jax.jit
def proxy_nca_loss(batch, labels, proxies):
    """ProxyNCA with ×3-scaled normalized embeddings/proxies (:574-635)."""
    norm = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    b = 3.0 * norm(batch)
    prox = 3.0 * norm(proxies)
    d = jnp.sum((b[:, None, :] - prox[None, :, :]) ** 2, axis=-1)  # [B, C]
    nclass = proxies.shape[0]
    onehot = jax.nn.one_hot(labels, nclass, dtype=bool)
    d_pos = jnp.sum(jnp.where(onehot, d, 0.0), axis=1)
    neg_lse = jax.scipy.special.logsumexp(
        jnp.where(onehot, -jnp.inf, -d), axis=1
    )
    return jnp.mean(d_pos + neg_lse)


def init_margin_beta(n_classes: int, beta: float = 1.2) -> jnp.ndarray:
    return jnp.full((n_classes,), beta, jnp.float32)


def init_proxies(rng_key, n_classes: int, dim: int) -> jnp.ndarray:
    return jax.random.normal(rng_key, (n_classes, dim)) / 8.0


def loss_select(name: str, nclass: int, embed_dim: int, rng_key=None) -> Tuple:
    """loss name → (host_sample_fn(batch_np, labels_np, rng) → aux,
    loss_fn(batch, labels, aux, extra_params) → scalar, extra_params pytree).

    Mirrors the upstream dispatcher (:33-84); 'crossentropy' maps to a linear
    head + softmax CE like CEClassLoss.
    """
    import optax

    if name == "triplet":
        return (
            lambda b, l, rng: {"triplets": random_triplets(b, l, rng)},
            lambda batch, labels, aux, params: triplet_loss(batch, aux["triplets"]),
            {},
        )
    if name == "npair":
        return (
            lambda b, l, rng: {"npairs": npair_tuples(l, rng)},
            lambda batch, labels, aux, params: (
                jnp.zeros((), batch.dtype)
                if aux.get("npairs") is None
                else npair_loss(batch, aux["npairs"])
            ),
            {},
        )
    if name == "marginloss":
        return (
            lambda b, l, rng: {
                "triplets": (t := distance_weighted_triplets(b, l, rng)),
                "anchor_classes": np.asarray(l)[t[:, 0]],
            },
            lambda batch, labels, aux, params: margin_loss(
                batch, aux["triplets"], aux["anchor_classes"], params["beta"]
            ),
            {"beta": init_margin_beta(nclass)},
        )
    if name == "proxynca":
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        return (
            lambda b, l, rng: {},
            lambda batch, labels, aux, params: proxy_nca_loss(
                batch, labels, params["proxies"]
            ),
            {"proxies": init_proxies(key, nclass, embed_dim)},
        )
    if name == "crossentropy":
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        w = jax.random.normal(key, (embed_dim, nclass)) / np.sqrt(embed_dim)
        return (
            lambda b, l, rng: {},
            lambda batch, labels, aux, params: optax.softmax_cross_entropy_with_integer_labels(
                batch @ params["w"] + params["b"], labels
            ).mean(),
            {"w": w, "b": jnp.zeros((nclass,))},
        )
    raise ValueError(f"Loss {name!r} not available")
