import numpy as np
import pytest

from vqwild_tpu.data.frames import SyntheticFrameStore
from vqwild_tpu.data.schema import load_moment_db, load_trimmed_db
from vqwild_tpu.parallel.mesh import make_mesh
from vqwild_tpu.retrieval import ARVRetrievalClip, ARVRetrievalMoment, ARVRetrievalTrimmed
from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn
from vqwild_tpu.retrieval.sharded import GalleryScorer


def extractor():
    return FeatureExtractor(
        make_fake_feat_fn(32, seed=3),
        SyntheticFrameStore(),
        test_frames=8,
        test_batch_size=4,
        input_size=64,
        fake=True,
    )


class TestGalleryScorer:
    def test_sharded_scores_match_single(self):
        mesh = make_mesh()
        rng = np.random.default_rng(0)
        g = rng.normal(size=(37, 16)).astype(np.float32)  # ragged vs 8 shards
        q = rng.normal(size=(5, 16)).astype(np.float32)
        single = GalleryScorer(g, mesh=None)
        sharded = GalleryScorer(g, mesh=mesh)
        s0 = np.asarray(single.scores(q))
        s1 = np.asarray(sharded.scores(q))[:, : sharded.n]
        np.testing.assert_allclose(s0, s1, atol=1e-5)
        assert sharded.n_padded % 8 == 0

    def test_pad_columns_marks_padding_ignored(self):
        mesh = make_mesh()
        g = np.zeros((10, 4), np.float32)
        sc = GalleryScorer(g, mesh=mesh)
        tp, ig = sc.pad_columns(np.ones((2, 10), bool), np.zeros((2, 10), bool))
        assert tp.shape == (2, sc.n_padded)
        assert not tp[:, 10:].any()
        assert ig[:, 10:].all()


class TestShardedEvaluators:
    """All three evaluators must produce identical metrics on the 8-device
    CPU mesh and on a single device."""

    def test_trimmed(self, tiny_arv):
        db = load_trimmed_db(tiny_arv["db_path"])
        kw = dict(eval_split="validation", r_at_n=(5, 10), rank_chunk=16)
        r0 = ARVRetrievalTrimmed(db, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalTrimmed(
            db, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["ap"] - r1["ap"]) < 1e-6
        assert r0["recall"] == r1["recall"]

    def test_clip(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        kw = dict(clip_sec=6, r_at_n=(5, 10), check_completeness=False)
        r0 = ARVRetrievalClip(mdb, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalClip(
            mdb, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["ap"] - r1["ap"]) < 1e-6

    def test_moment(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        kw = dict(moment_clip_sec=5, max_clips_per_moment=3, r_at_n=(5,), workers=2)
        r0 = ARVRetrievalMoment(mdb, tiny_arv["spec"], extractor(), **kw).evaluation()
        r1 = ARVRetrievalMoment(
            mdb, tiny_arv["spec"], extractor(), mesh=make_mesh(), **kw
        ).evaluation()
        assert abs(r0["map05"]["ap"] - r1["map05"]["ap"]) < 1e-6


class TestDistributedInit:
    def test_single_process_noop(self):
        from vqwild_tpu.parallel.distributed import initialize

        assert initialize() is False
