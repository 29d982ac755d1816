import numpy as np
import pytest

from vqwild_tpu.data.frames import SyntheticFrameStore
from vqwild_tpu.data.schema import load_moment_db, load_trimmed_db
from vqwild_tpu.retrieval import (
    ARVRetrievalClip,
    ARVRetrievalMoment,
    ARVRetrievalTrimmed,
    MetricAggregator,
    generate_multi_query,
)
from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn
from vqwild_tpu.retrieval.moment import moment_query_metrics, temporal_iou


def fake_extractor(**kw):
    return FeatureExtractor(
        make_fake_feat_fn(feat_dim=32, seed=0),
        SyntheticFrameStore(),
        test_frames=8,
        test_batch_size=4,
        input_size=64,
        fake=True,
        **kw,
    )


class TestMultiQuery:
    def test_deterministic_and_excludes_self(self):
        queries = [
            {"label": "a", "vid": f"v{i}"} for i in range(6)
        ] + [{"label": "b", "vid": f"w{i}"} for i in range(4)]
        ex1 = generate_multi_query(
            queries, lambda q: q["label"], lambda q: q["vid"]
        )
        ex2 = generate_multi_query(
            queries, lambda q: q["label"], lambda q: q["vid"]
        )
        assert ex1 == ex2  # seeded → reproducible
        for qs in ex1:
            assert len(qs) == 5
            assert all(o["label"] == qs[0]["label"] for o in qs)
            assert all(o["vid"] != qs[0]["vid"] for o in qs[1:])


class TestAggregator:
    def test_query_count_weighting_quirk(self):
        """2-order base/novel means weight classes by query count (upstream
        keeps one class entry per query); o2_class_specific_map does not."""
        agg = MetricAggregator(r_at_n=(5,))
        infos = [("a", "base"), ("a", "base"), ("b", "base"), ("n", "novel")]
        agg.set_class_info(infos)
        for cls, rtype, ap in [("a", "base", 1.0), ("a", "base", 1.0), ("b", "base", 0.1), ("n", "novel", 0.5)]:
            agg.add(cls, rtype, ap, [0.0])
        r = agg.result()
        # class means: a=1.0, b=0.1, n=0.5
        # weighted base = (1.0 + 1.0 + 0.1)/3 = 0.7; unweighted map = (1.0+0.1+0.5)/3
        assert abs(r["base_map"] - 0.7) < 1e-9
        assert abs(r["o2_class_specific_map"] - (1.0 + 0.1 + 0.5) / 3) < 1e-9
        assert abs(r["novel_map"] - 0.5) < 1e-9
        hm = 2.0 / (1 / (0.7 + 1e-10) + 1 / (0.5 + 1e-10))
        assert abs(r["ap"] - hm) < 1e-9


class TestTrimmedEval:
    def test_end_to_end_fake_features(self, tiny_arv):
        db = load_trimmed_db(tiny_arv["db_path"])
        ev = ARVRetrievalTrimmed(
            db,
            tiny_arv["spec"],
            fake_extractor(),
            eval_split="validation",
            r_at_n=(5, 10, 30),
            rank_chunk=7,
        )
        result = ev.evaluation()
        assert 0.0 <= result["ap"] <= 1.0
        assert set(result["recall"]) == {"5", "10", "30"}
        assert 0 < result["o1_class_agnostic_map"] <= 1.0
        # with random features mAP should be near chance, not near 1
        assert result["ap"] < 0.9

    def test_perfect_features_perfect_map(self, tiny_arv):
        """Features equal to a one-hot of the class → every same-class item
        ranks first → mAP ≈ 1 (robust quirk keeps it marginally below)."""
        db = load_trimmed_db(tiny_arv["db_path"])
        ex = fake_extractor()
        labels = {}

        def oracle_extract(records):
            feats = np.zeros((len(records), 32), np.float32)
            for i, r in enumerate(records):
                labels.setdefault(r.label, len(labels))
                feats[i, labels[r.label]] = 1.0
                feats[i] += np.random.default_rng(i).normal(scale=1e-3, size=32).astype(np.float32)
            return feats

        ex.extract_trimmed = oracle_extract
        # robust_map off: the forced trailing tp would cap AP well below 1
        ev = ARVRetrievalTrimmed(
            db,
            tiny_arv["spec"],
            ex,
            eval_split="validation",
            r_at_n=(5, 10, 30),
            robust_map=False,
        )
        result = ev.evaluation()
        assert result["o1_class_agnostic_map"] > 0.95
        assert result["recall"]["30"] > 0.95

    def test_cache_roundtrip(self, tiny_arv, tmp_path):
        db = load_trimmed_db(tiny_arv["db_path"])
        ex = fake_extractor(cache_dir=str(tmp_path))
        ev = ARVRetrievalTrimmed(
            db, tiny_arv["spec"], ex, eval_split="validation", r_at_n=(5,)
        )
        r1 = ev.evaluation()
        ev2 = ARVRetrievalTrimmed(
            db,
            tiny_arv["spec"],
            fake_extractor(cache_dir=str(tmp_path)),
            eval_split="validation",
            r_at_n=(5,),
            read_cache=True,
        )
        r2 = ev2.evaluation()
        assert abs(r1["ap"] - r2["ap"]) < 1e-9  # cached feats → identical result


class TestClipEval:
    def test_end_to_end(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        ev = ARVRetrievalClip(
            mdb,
            tiny_arv["spec"],
            fake_extractor(),
            clip_sec=6,
            r_at_n=(5, 10, 30),
            check_completeness=False,
        )
        result = ev.evaluation()
        assert 0.0 <= result["ap"] <= 1.0

    def test_window_label_containment(self):
        from vqwild_tpu.data.schema import Annotation
        from vqwild_tpu.retrieval.clip import window_label

        anns = [
            Annotation(segment=(0.0, 5.0), label="x"),
            Annotation(segment=(2.0, 20.0), label="y"),
        ]
        assert window_label(anns, (3.0, 9.0), {"x", "y"}) == "y"
        assert window_label(anns, (0.0, 4.0), {"x", "y"}) == "x"  # first match
        assert window_label(anns, (3.0, 9.0), {"y"}) == "y"  # x filtered out
        assert window_label(anns, (10.0, 25.0), {"x", "y"}) == "unknown"


class TestMomentEval:
    def test_temporal_iou(self):
        assert temporal_iou(0, 10, 5, 15) == pytest.approx(5 / 15)
        assert temporal_iou(0, 10, 20, 30) == 0.0  # disjoint
        assert temporal_iou(0, 10, 0, 10) == 1.0

    def test_moment_query_metrics_grouped_order(self):
        """R@N must follow the grouped-by-video order, not score order."""
        # two videos; video B's best scores higher than video A's
        scores = np.array([0.9, 0.1, 0.95, 0.2])
        video_idx = np.array([0, 0, 1, 1])
        start = np.array([0.0, 100.0, 0.0, 100.0])
        end = np.array([10.0, 110.0, 10.0, 110.0])
        iou = np.array([0.6, 0.0, 0.0, 0.6])
        ignore = np.zeros(4, bool)
        ap, recalls = moment_query_metrics(
            scores, video_idx, start, end, iou, ignore,
            nms_threshold=0.5, r_at_n=(2,), robust=False,
        )
        # grouped order: video1 first (best rank): [0.95, 0.2], then video0 [0.9, 0.1]
        # tps in grouped order: [F, T, T, F] → top-2 → 1 of 2 tps → R@2 = 0.5
        assert recalls[0] == pytest.approx(0.5)

    def test_nms_suppression_by_ignored(self):
        """An ignored moment can suppress an overlapping valid tp moment."""
        scores = np.array([0.9, 0.8])
        video_idx = np.array([0, 0])
        start = np.array([0.0, 1.0])
        end = np.array([10.0, 11.0])
        iou = np.array([0.0, 0.9])
        ignore = np.array([True, False])
        ap, recalls = moment_query_metrics(
            scores, video_idx, start, end, iou, ignore,
            nms_threshold=0.5, r_at_n=(5,), robust=False,
        )
        # moment 1 suppressed by ignored moment 0 → nothing valid remains
        assert ap == 0.0 and recalls[0] == 0.0

    def test_end_to_end(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        ev = ARVRetrievalMoment(
            mdb,
            tiny_arv["spec"],
            fake_extractor(),
            moment_clip_sec=5,
            max_clips_per_moment=3,
            r_at_n=(5, 10, 30),
            rank_chunk=6,
            workers=2,
        )
        result = ev.evaluation()
        assert "map05" in result
        assert 0.0 <= result["map05"]["ap"] <= 1.0

    def test_bf16_score_readback_matches_fp32(self, tiny_arv):
        """score_readback_dtype="bfloat16" halves the dominant device→host
        transfer (benchmarks/EVAL_SCALE_r03_tpu_moment.json: 226 s of 334 s
        at production scale through the relay); headline metrics must agree
        with the fp32 path up to bf16 rounding-level rank flips."""
        mdb = load_moment_db(tiny_arv["moment_path"])

        def run(dtype):
            ev = ARVRetrievalMoment(
                mdb,
                tiny_arv["spec"],
                fake_extractor(),
                moment_clip_sec=5,
                max_clips_per_moment=3,
                r_at_n=(5, 10, 30),
                rank_chunk=6,
                workers=2,
                score_readback_dtype=dtype,
            )
            r = ev.evaluation()["map05"]
            return r

        r32 = run("float32")
        r16 = run("bfloat16")
        for key in ("ap", "base_map", "novel_map"):
            assert abs(r32[key] - r16[key]) < 5e-3, (key, r32[key], r16[key])
        for n in r32["recall"]:
            # R@N on the tiny fixture moves in 1/npos steps, so one
            # near-tie rank flip shifts it by ~1e-2; allow single-flip scale
            assert abs(r32["recall"][n] - r16["recall"][n]) < 2e-2

    def test_bad_readback_dtype_rejected(self, tiny_arv):
        mdb = load_moment_db(tiny_arv["moment_path"])
        with pytest.raises(ValueError):
            ARVRetrievalMoment(
                mdb, tiny_arv["spec"], fake_extractor(),
                score_readback_dtype="fp8",
            )


class TestClosestHitsVectorized:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_loop(self, seed):
        from vqwild_tpu.data.schema import Annotation
        from vqwild_tpu.retrieval.moment import closest_hit, closest_hits_vectorized

        rng = np.random.default_rng(seed)
        anns = [
            Annotation(
                segment=(float(s), float(s + rng.uniform(2, 30))),
                label=f"c{int(rng.integers(4))}",
            )
            for s in rng.uniform(0, 100, 6)
        ]
        allowed = {"c0", "c1", "c2"}  # c3 filtered out
        starts = rng.uniform(0, 100, 40)
        locs = np.stack([starts, starts + rng.uniform(5, 50, 40)], axis=1)
        labels_v, ious_v = closest_hits_vectorized(anns, locs, allowed)
        for k in range(len(locs)):
            hit = closest_hit(anns, locs[k], allowed)
            if hit is None:
                assert labels_v[k] == ""
                assert ious_v[k] == 0.0
            else:
                assert labels_v[k] == hit[0], k
                assert abs(ious_v[k] - hit[1]) < 1e-12

    def test_no_allowed_annotations(self):
        from vqwild_tpu.retrieval.moment import closest_hits_vectorized

        locs = np.array([[0.0, 5.0], [5.0, 10.0]])
        labels, ious = closest_hits_vectorized([], locs, {"x"})
        assert list(labels) == ["", ""]
        assert (ious == 0).all()


class TestFeatureCacheFormat:
    """The on-disk cache is a directory of memmap-able .npy files (one per
    key); legacy single-file .npz caches still load."""

    def test_memmap_roundtrip_and_overwrite(self, tmp_path):
        ex = fake_extractor(cache_dir=str(tmp_path))
        feats = np.arange(24, dtype=np.float32).reshape(6, 4)
        labels = np.array(["a", "b", "c", "d", "e", "f"])
        ex.save_cache("gal.npz", feats=feats, hit_label=labels)
        out = ex.load_cache("gal.npz")
        np.testing.assert_array_equal(np.asarray(out["feats"]), feats)
        assert list(out["hit_label"]) == list(labels)
        # numeric arrays come back memory-mapped (zero-copy load)
        assert isinstance(out["feats"], np.memmap)
        # overwrite replaces the whole directory atomically
        ex.save_cache("gal.npz", feats=feats * 2)
        out2 = ex.load_cache("gal.npz")
        np.testing.assert_array_equal(np.asarray(out2["feats"]), feats * 2)
        assert "hit_label" not in out2

    def test_legacy_npz_fallback(self, tmp_path):
        ex = fake_extractor(cache_dir=str(tmp_path))
        np.savez(tmp_path / "old.npz", x=np.ones(3))
        out = ex.load_cache("old.npz")
        np.testing.assert_array_equal(out["x"], np.ones(3))

    def test_miss_returns_none(self, tmp_path):
        ex = fake_extractor(cache_dir=str(tmp_path))
        assert ex.load_cache("absent.npz") is None

    def test_failed_publish_over_incomplete_dir_raises(self, tmp_path, monkeypatch):
        """If os.replace fails AND the surviving directory is missing some of
        the arrays being written (half-deleted by a partially-failed rmtree),
        the writer must raise rather than publish the husk (ADVICE r3)."""
        import os as _os

        ex = fake_extractor(cache_dir=str(tmp_path))
        base = tmp_path / "gal"
        base.mkdir()
        np.save(base / "feats.npy", np.ones(3))  # 'hit_label.npy' missing

        def boom(src, dst):
            raise OSError(39, "Directory not empty", dst)

        monkeypatch.setattr(_os, "replace", boom)
        monkeypatch.setattr("shutil.rmtree", lambda *a, **k: None)  # rmtree "fails"
        with pytest.raises(OSError):
            ex.save_cache("gal.npz", feats=np.ones(3), hit_label=np.array(["a"]))

    def test_failed_publish_over_complete_dir_is_accepted(self, tmp_path, monkeypatch):
        """A concurrent writer's complete result is accepted when replace
        loses the race."""
        import os as _os
        import shutil as _shutil

        ex = fake_extractor(cache_dir=str(tmp_path))
        ex.save_cache("gal.npz", feats=np.ones(3), hit_label=np.array(["a"]))
        real_rmtree = _shutil.rmtree

        def boom(src, dst):
            real_rmtree(src)  # emulate: our tmp consumed, dst already present
            raise OSError(39, "Directory not empty", dst)

        monkeypatch.setattr(_os, "replace", boom)
        monkeypatch.setattr(
            "shutil.rmtree", lambda p, **k: None if p.endswith("gal") else real_rmtree(p, **k)
        )
        ex.save_cache("gal.npz", feats=np.ones(3) * 2, hit_label=np.array(["b"]))
        out = ex.load_cache("gal.npz")
        assert out is not None and set(out) == {"feats", "hit_label"}


class TestExtractorYUVWire:
    def test_trimmed_features_match_rgb_wire(self, tiny_arv):
        from tests.test_train import small_setup
        from vqwild_tpu.retrieval.features import make_feat_fn

        db = load_trimmed_db(tiny_arv["db_path"])
        records = db.flat("validation")[:5]
        model, state, _ = small_setup("baseline")
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def mk(wire):
            return FeatureExtractor(
                make_feat_fn(model, variables, wire=wire),
                SyntheticFrameStore(),
                test_frames=2,
                test_batch_size=4,
                input_size=32,
                wire=wire,
            )

        a = mk("rgb").extract_trimmed(records)
        b = mk("yuv420").extract_trimmed(records)
        assert a.shape == b.shape
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        assert np.sum(an * bn, axis=1).min() > 0.99
