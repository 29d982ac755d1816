import numpy as np
import pytest

from vqwild_tpu.data.frames import SyntheticFrameStore
from vqwild_tpu.data.schema import load_trimmed_db
from vqwild_tpu.data.triplets import PrefetchLoader, TripletDataset
from vqwild_tpu.retrieval.features import make_feat_fn
from vqwild_tpu.train.checkpoint import CheckpointManager
from vqwild_tpu.train.loop import TrainLoop


class TestResume:
    def test_last_checkpoint_full_state_roundtrip(self, tiny_arv, tmp_path):
        import jax

        from tests.test_train import rand_batch, small_setup

        model, state, step = small_setup("va")
        rng = np.random.default_rng(0)
        clips, labels = rand_batch(rng, b=4)
        state, _ = step(state, clips, labels)

        ckpt = CheckpointManager(str(tmp_path))
        payload = dict(
            params=state.params,
            batch_stats=state.batch_stats,
            memory=state.memory,
            opt_state=state.opt_state,
            step=state.step,
            dropout_rng=state.dropout_rng,
            epoch=3,
        )
        ckpt.save("last", payload)
        template = jax.tree_util.tree_map(np.asarray, payload)
        restored = ckpt.restore("last", template)
        assert int(restored["epoch"]) == 3
        assert int(restored["step"]) == 1
        np.testing.assert_allclose(
            np.asarray(restored["memory"]["visual_memory"]),
            np.asarray(state.memory["visual_memory"]),
            atol=0,
        )
        # optimizer moments survive
        flat_a = jax.tree_util.tree_leaves(restored["opt_state"])
        flat_b = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.opt_state)
        )
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_start_epoch_skips(self, tiny_arv):
        from tests.test_train import small_setup

        db = load_trimmed_db(tiny_arv["db_path"])
        ds = TripletDataset(
            db,
            tiny_arv["spec"],
            SyntheticFrameStore(h=40, w=48),
            novel_num=5,
            train_frames=2,
            crop_size=32,
            nclass=tiny_arv["nclass"],
        )
        loader = PrefetchLoader(ds, batch_size=2, steps_per_epoch=2, workers=1)
        model, state, step = small_setup("baseline")
        seen = []
        loop = TrainLoop(
            step,
            loader,
            epochs=4,
            eval_fn=lambda st, e: seen.append(e) or {"ap": 0.0},
            eval_per_epoch=1,
            start_epoch=2,
            print_freq=1000,
        )
        loop.run(state)
        assert seen == [2, 3]


class TestShardedFeatFn:
    def test_matches_single_device(self):
        import jax

        from tests.test_train import small_setup
        from vqwild_tpu.parallel.mesh import make_mesh

        model, state, _ = small_setup("baseline")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        f0 = make_feat_fn(model, variables)
        f1 = make_feat_fn(model, variables, mesh=make_mesh())
        rng = np.random.default_rng(0)
        clips = rng.integers(0, 255, (5, 2, 32, 32, 3), dtype=np.uint8)  # ragged vs 8
        a = f0(clips)
        b = f1(clips)
        assert a.shape == b.shape == (5, 512, 2)
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestYUVWireFeatFn:
    def test_yuv_wire_matches_rgb(self):
        """The 4:2:0 wire format must produce near-identical embeddings on
        chroma-smooth content (source JPEGs are 4:2:0 to begin with)."""
        from tests.test_train import small_setup
        from vqwild_tpu.ops.preprocess import rgb_to_yuv420_host

        model, state, _ = small_setup("baseline")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        f_rgb = make_feat_fn(model, variables)
        f_yuv = make_feat_fn(model, variables, wire="yuv420")
        rng = np.random.default_rng(0)
        small = rng.integers(0, 255, (3, 2, 16, 16, 3), dtype=np.uint8)
        clips = np.repeat(np.repeat(small, 2, axis=2), 2, axis=3)  # 32x32
        a = f_rgb(clips)
        b = f_yuv(*rgb_to_yuv420_host(clips))
        assert a.shape == b.shape == (3, 512, 2)
        # embeddings are L2-normalized; cosine similarity ≈ 1
        cos = np.sum(a * b, axis=1)
        assert cos.min() > 0.999
