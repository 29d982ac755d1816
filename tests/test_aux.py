import json

import numpy as np
import pytest

from vqwild_tpu.core.summaries import model_summary, optimizer_summary
from vqwild_tpu.wordembed import build as we_build
from vqwild_tpu.wordembed.check import nearest_neighbor_report


class TestSummaries:
    def test_model_summary_counts(self):
        params = {"fc": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)}}
        assert model_summary(params) == 40
        optimizer_summary(1e-4, 1e-5, 9)


class TestWordEmbed:
    def test_tokenize_substitutions(self):
        assert we_build.tokenize_label("Mooping floor") == ["cleaning", "floor"]
        assert we_build.tokenize_label("Slacklining") == ["slackline"]
        assert we_build.tokenize_label("Carving jack-o-lanterns") == [
            "carving",
            "carving",
            "halloween",
            "pumpkin",
        ]
        assert we_build.tokenize_label("Playing Congas") == ["playing", "congas"]

    def test_build_and_check(self, tmp_path):
        vectors = {
            "playing": np.array([1.0, 0.0], np.float32),
            "congas": np.array([0.0, 1.0], np.float32),
            "drums": np.array([0.1, 0.9], np.float32),
            "archery": np.array([-1.0, 0.0], np.float32),
        }
        embeds = we_build.build_class_embeddings(
            ["Playing congas", "Playing drums", "Archery", "Zumba"], vectors
        )
        np.testing.assert_allclose(embeds["Playing congas"], [0.5, 0.5], atol=1e-6)
        assert np.allclose(embeds["Zumba"], 0.0)  # all tokens OOV → zeros
        path = str(tmp_path / "e.json")
        we_build.write_embeddings_json(embeds, path)
        report = nearest_neighbor_report(path, topk=2)
        # congas' nearest non-self neighbor is drums
        assert report["Playing congas"][0]["label"] == "Playing congas"
        assert report["Playing congas"][1]["label"] == "Playing drums"

    def test_load_vector_table(self, tmp_path):
        p = tmp_path / "vec.txt"
        p.write_text("2 3\nfoo 1 2 3\nbar 4 5 6\n")
        table = we_build.load_vector_table(str(p))
        assert set(table) == {"foo", "bar"}
        np.testing.assert_allclose(table["bar"], [4, 5, 6])


class TestDiagnostics:
    def test_trimmed_cm_dict(self, tiny_arv):
        from vqwild_tpu.data.frames import SyntheticFrameStore
        from vqwild_tpu.data.schema import load_trimmed_db
        from vqwild_tpu.retrieval import ARVRetrievalTrimmed
        from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn

        db = load_trimmed_db(tiny_arv["db_path"])
        ex = FeatureExtractor(
            make_fake_feat_fn(16, seed=0),
            SyntheticFrameStore(),
            test_frames=4,
            test_batch_size=8,
            input_size=64,
            fake=True,
        )
        ev = ARVRetrievalTrimmed(
            db,
            tiny_arv["spec"],
            ex,
            eval_split="validation",
            r_at_n=(5,),
            collect_diagnostics=True,
        )
        r = ev.evaluation()
        cm = r["cm_dict"]
        assert len(cm["gt_labels"]) == len(cm["label"])
        assert cm["top30_result_list"] and len(cm["top30_result_list"][0]) <= 30
        assert cm["base_classes"] and cm["novel_classes"]
        assert cm["query_duration_map_dict"]
        # system-level y_true/y_pred stream (dataloader:448-456)
        sysd = cm["system_ap_dict"]
        import numpy as np

        yt, yp = sysd["y_true"], sysd["y_pred"]
        assert len(yt) == len(yp) > 0
        assert set(np.unique(yt)) <= {0, 1}
        assert len(sysd["base_y_true"]) + len(sysd["novel_y_true"]) == len(yt)
        assert len(sysd["base_y_pred"]) == len(sysd["base_y_true"])
        # scores arrive ranked: within each query the stream is descending,
        # so the global stream's positives must include the robust trailing 1
        assert yt[-1] == 1
        assert cm["pass_content"]  # expanded query lists (dataloader:1611)

    def _fake_extractor(self):
        from vqwild_tpu.data.frames import SyntheticFrameStore
        from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn

        return FeatureExtractor(
            make_fake_feat_fn(16, seed=0),
            SyntheticFrameStore(),
            test_frames=4,
            test_batch_size=8,
            input_size=64,
            fake=True,
        )

    def _check_cm(self, cm, want_top30_keys):
        import numpy as np

        assert len(cm["gt_labels"]) == len(cm["label"]) > 0
        assert cm["top30_result_list"] and len(cm["top30_result_list"][0]) <= 30
        assert set(cm["top30_result_list"][0][0]) == want_top30_keys
        assert cm["query_duration_map_dict"]
        sysd = cm["system_ap_dict"]
        assert len(sysd["y_true"]) == len(sysd["y_pred"]) > 0
        assert set(np.unique(sysd["y_true"])) <= {0, 1}
        assert (
            len(sysd["base_y_true"]) + len(sysd["novel_y_true"])
            == len(sysd["y_true"])
        )
        assert cm["class_map_dict"]

    def test_clip_cm_dict(self, tiny_arv):
        from vqwild_tpu.data.schema import load_moment_db
        from vqwild_tpu.retrieval import ARVRetrievalClip

        mdb = load_moment_db(tiny_arv["moment_path"])
        r = ARVRetrievalClip(
            mdb,
            tiny_arv["spec"],
            self._fake_extractor(),
            clip_sec=6,
            r_at_n=(5,),
            check_completeness=False,
            collect_diagnostics=True,
        ).evaluation()
        self._check_cm(r["cm_dict"], {"video_id", "clip_label", "loc"})

    def test_moment_cm_dict(self, tiny_arv):
        from vqwild_tpu.data.schema import load_moment_db
        from vqwild_tpu.retrieval import ARVRetrievalMoment

        mdb = load_moment_db(tiny_arv["moment_path"])
        ev = ARVRetrievalMoment(
            mdb,
            tiny_arv["spec"],
            self._fake_extractor(),
            moment_clip_sec=5,
            max_clips_per_moment=3,
            r_at_n=(5,),
            rank_chunk=6,
            workers=2,
            collect_diagnostics=True,
        )
        r = ev.evaluation()
        cm = r["map05"]["cm_dict"]
        self._check_cm(cm, {"video_id", "loc", "hit_label", "hit_iou"})
        # diagnostics must not perturb the metrics themselves
        ev2 = ARVRetrievalMoment(
            mdb,
            tiny_arv["spec"],
            self._fake_extractor(),
            moment_clip_sec=5,
            max_clips_per_moment=3,
            r_at_n=(5,),
            rank_chunk=6,
            workers=2,
        )
        r2 = ev2.evaluation()
        # 1e-7: ev2 takes the device engine whose score path fuses the query
        # gather into the distance kernel — elementwise math reorders in the
        # last ulp vs the diagnostics (host) engine's materialized features
        assert abs(r["map05"]["ap"] - r2["map05"]["ap"]) < 1e-7


class TestRankingLoss:
    def test_ranking_weight_adds_loss(self):
        import jax

        from tests.test_train import rand_batch, small_setup
        from vqwild_tpu.train.step import make_train_step

        model, state, _ = small_setup("baseline")
        import optax

        from vqwild_tpu.train.step import make_optimizer

        tx = make_optimizer(1e-3, 0.0, 10, 9)
        step = make_train_step(model, tx, ranking_weight=0.5, donate=False)
        rng = np.random.default_rng(0)
        clips, labels = rand_batch(rng, b=6)
        # triplet structure: (a, p, n) per 3 consecutive clips
        labels = np.array([0, 0, 1, 2, 2, 3], np.int32)
        s1, losses = step(state, clips, labels)
        assert "ranking_loss" in losses and np.isfinite(float(losses["ranking_loss"]))
        assert float(losses["loss"]) >= float(losses["ce_loss"])


class TestDistributedSingleProcess:
    """The multi-process paths run in tests/test_multiprocess.py on a real
    2-process cluster; these guard the single-process no-op contracts."""

    def test_initialize_returns_false_without_cluster_env(self, monkeypatch):
        from vqwild_tpu.parallel import distributed

        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("NUM_PROCESSES", raising=False)
        monkeypatch.delenv("PROCESS_ID", raising=False)
        assert distributed.initialize() is False

    def test_barrier_noop_single_process(self):
        from vqwild_tpu.parallel import distributed

        distributed.barrier("test_noop")  # must return, not block or raise


class TestHostSignature:
    def test_stable_and_wellformed(self):
        """Compiled-artifact caches key on this: must be deterministic within
        a host and a short hex token safe for filenames."""
        from vqwild_tpu.core.hostsig import host_cpu_signature

        a = host_cpu_signature()
        assert a == host_cpu_signature()
        assert len(a) == 10 and all(c in "0123456789abcdef" for c in a)

    def test_native_so_path_is_host_keyed(self):
        from vqwild_tpu.core.hostsig import host_cpu_signature
        from vqwild_tpu.native import lib as native_lib

        assert host_cpu_signature() in native_lib._so_path()


class TestChunkedDevicePut:
    def test_equal_and_chunked(self):
        import numpy as np

        from vqwild_tpu.core.transfer import chunked_device_put

        x = np.arange(48 * 7, dtype=np.float32).reshape(48, 7)
        d = chunked_device_put(x, chunk_bytes=7 * 4 * 5)  # 5 rows per message
        np.testing.assert_array_equal(np.asarray(d), x)
        d1 = chunked_device_put(x[0])  # 1-D passthrough
        np.testing.assert_array_equal(np.asarray(d1), x[0])
