import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqwild_tpu.train import dml


def embeddings(bs=12, dim=8, seed=0, nclass=4):
    rng = np.random.default_rng(seed)
    batch = rng.normal(size=(bs, dim)).astype(np.float32)
    labels = np.arange(bs) % nclass
    return batch, labels.astype(np.int32)


class TestSamplers:
    def test_random_triplets_valid(self):
        batch, labels = embeddings()
        rng = np.random.default_rng(0)
        t = dml.random_triplets(batch, labels, rng)
        assert t.shape == (len(labels), 3)
        assert (labels[t[:, 0]] == labels[t[:, 1]]).all()
        assert (labels[t[:, 0]] != labels[t[:, 2]]).all()
        assert (t[:, 0] != t[:, 1]).all()

    def test_semihard_triplets_valid(self):
        batch, labels = embeddings()
        t = dml.semihard_triplets(batch, labels, np.random.default_rng(0))
        assert len(t) == len(labels)
        assert (labels[t[:, 0]] == labels[t[:, 1]]).all()
        assert (labels[t[:, 0]] != labels[t[:, 2]]).all()

    def test_distance_weighted_valid(self):
        batch, labels = embeddings()
        # normalize like real embeddings (sampler assumes unit sphere)
        batch = batch / np.linalg.norm(batch, axis=1, keepdims=True)
        t = dml.distance_weighted_triplets(batch, labels, np.random.default_rng(0))
        assert len(t) == len(labels)
        assert (labels[t[:, 0]] == labels[t[:, 1]]).all()

    def test_npair_tuples(self):
        _, labels = embeddings(nclass=4)
        rows = dml.npair_tuples(labels, np.random.default_rng(0))
        assert rows.shape == (4, 2 + 3)
        for r in rows:
            assert labels[r[0]] == labels[r[1]]
            assert len({labels[x] for x in r[2:]}) == 3  # one per other class


class TestLosses:
    def test_triplet_loss_matches_manual(self):
        batch, labels = embeddings()
        t = dml.random_triplets(batch, labels, np.random.default_rng(1))
        loss = float(dml.triplet_loss(jnp.asarray(batch), jnp.asarray(t), 1.0))
        manual = np.mean(
            [
                max(
                    0.0,
                    ((batch[a] - batch[p]) ** 2).sum()
                    - ((batch[a] - batch[n]) ** 2).sum()
                    + 1.0,
                )
                for a, p, n in t
            ]
        )
        assert abs(loss - manual) < 1e-5

    def test_npair_loss_matches_manual(self):
        batch, labels = embeddings()
        rows = dml.npair_tuples(labels, np.random.default_rng(2))
        loss = float(dml.npair_loss(jnp.asarray(batch), jnp.asarray(rows), l2=0.02))
        per_row = []
        pens = []
        for r in rows:
            a, p, negs = batch[r[0]], batch[r[1]], batch[r[2:]]
            inner = a @ (negs - p).T
            per_row.append(np.log1p(np.exp(inner).sum()))
            pens.append((a**2 + p**2).sum())
        manual = np.mean(per_row) + 0.02 * np.mean(pens)
        assert abs(loss - manual) < 1e-4

    def test_margin_loss_active_pair_normalization(self):
        batch, labels = embeddings()
        t = dml.random_triplets(batch, labels, np.random.default_rng(3))
        beta = dml.init_margin_beta(4, 1.2)
        loss = float(
            dml.margin_loss(
                jnp.asarray(batch), jnp.asarray(t), jnp.asarray(labels[t[:, 0]]), beta
            )
        )
        assert np.isfinite(loss) and loss >= 0

    def test_margin_beta_gradient(self):
        batch, labels = embeddings()
        t = dml.random_triplets(batch, labels, np.random.default_rng(3))
        anchor_cls = jnp.asarray(labels[t[:, 0]])

        def f(beta):
            return dml.margin_loss(jnp.asarray(batch), jnp.asarray(t), anchor_cls, beta)

        g = jax.grad(f)(dml.init_margin_beta(4, 1.2))
        assert np.abs(np.asarray(g)).sum() > 0  # betas are trainable

    def test_proxy_nca_matches_manual(self):
        batch, labels = embeddings(bs=6, nclass=3)
        proxies = dml.init_proxies(jax.random.PRNGKey(0), 3, batch.shape[1])
        loss = float(dml.proxy_nca_loss(jnp.asarray(batch), jnp.asarray(labels), proxies))
        b = 3 * batch / np.linalg.norm(batch, axis=1, keepdims=True)
        pr = np.asarray(proxies)
        pr = 3 * pr / np.linalg.norm(pr, axis=1, keepdims=True)
        d = ((b[:, None] - pr[None]) ** 2).sum(-1)
        manual = []
        for i, y in enumerate(labels):
            negd = np.delete(d[i], y)
            manual.append(d[i, y] + np.log(np.exp(-negd).sum()))
        assert abs(loss - np.mean(manual)) < 1e-4

    def test_loss_select_all(self):
        batch, labels = embeddings()
        rng = np.random.default_rng(0)
        for name in ["triplet", "npair", "marginloss", "proxynca", "crossentropy"]:
            sample_fn, loss_fn, params = dml.loss_select(name, nclass=4, embed_dim=8)
            aux = sample_fn(batch, labels, rng)
            aux = {k: jnp.asarray(v) for k, v in aux.items()}
            loss = loss_fn(jnp.asarray(batch), jnp.asarray(labels), aux, params)
            assert np.isfinite(float(loss)), name

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError):
            dml.loss_select("contrastive", 4, 8)
