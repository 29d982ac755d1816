import json

import numpy as np
import pytest

from vqwild_tpu.data.labels import ACTIVITYNET_LABELS, split_registry
from vqwild_tpu.datagen import pipeline


def synthetic_activitynet(nvid=20, seed=0):
    rng = np.random.default_rng(seed)
    labels = ["alpha", "beta", "gamma", "delta"]
    db = {}
    for i in range(nvid):
        subset = ["training", "validation", "testing"][i % 3]
        duration = float(rng.uniform(60, 300))
        anns = []
        t = 5.0
        for k in range(int(rng.integers(1, 4))):
            length = float(rng.uniform(4, 40))
            if t + length > duration - 5:
                break
            anns.append(
                {"segment": [t, t + length], "label": labels[int(rng.integers(4))]}
            )
            t += length + float(rng.uniform(15, 40))
        db[f"vid{i:03d}"] = {
            "duration": duration,
            "subset": subset,
            "annotations": anns,
        }
    return {"database": db}, labels


class TestLabelPartitions:
    def test_matches_frozen_assets(self):
        """The generation function must reproduce the frozen partitions
        (cumulative seed-620 shuffle quirk in import order)."""
        parts = pipeline.generate_label_partitions(ACTIVITYNET_LABELS)
        reg = split_registry()
        for name, spec in reg.items():
            assert tuple(parts[name]["train"]) == spec.train_labels, name
            assert tuple(parts[name]["val"]) == spec.val_labels, name
            assert tuple(parts[name]["test"]) == spec.test_labels, name


class TestSegments:
    def test_segment_properties(self):
        anet, _ = synthetic_activitynet()
        segs = pipeline.generate_video_segments(anet, seed=7)
        assert segs, "no segments mined"
        for s in segs:
            b0, b1 = s["border"]
            g0, g1 = s["segment"]
            assert b0 <= g0 <= g1 <= b1 + 1e-9
            assert b0 >= 0 and b1 <= s["activitynet_duration"] + 1e-9
            if s["label"] != pipeline.NOISE_LABEL:
                assert g1 - g0 >= 3.0  # activity_minimal_sec
            else:
                assert 10.0 <= g1 - g0 <= 180.0
            assert s["activitynet_subset"] in ("training", "validation")

    def test_no_testing_subset(self):
        anet, _ = synthetic_activitynet()
        segs = pipeline.generate_video_segments(anet, seed=7)
        assert all(s["activitynet_subset"] != "testing" for s in segs)

    def test_deterministic_with_seed(self):
        anet, _ = synthetic_activitynet()
        a = pipeline.generate_video_segments(anet, seed=3)
        b = pipeline.generate_video_segments(anet, seed=3)
        assert a == b

    def test_paddings_do_not_overlap_annotations(self):
        """Borders of non-noise segments may only cover background."""
        anet, _ = synthetic_activitynet(nvid=30, seed=1)
        segs = pipeline.generate_video_segments(anet, seed=5)
        ann_by_vid = {
            vid: [a["segment"] for a in v["annotations"]]
            for vid, v in anet["database"].items()
        }
        for s in segs:
            if s["label"] == pipeline.NOISE_LABEL:
                continue
            for a0, a1 in ann_by_vid[s["video_id"]]:
                if abs(a0 - s["segment"][0]) < 2e-2:  # own annotation
                    continue
                # padding [border0, segment0) must not overlap other anns
                overlap = max(
                    0.0, min(s["segment"][0], a1) - max(s["border"][0], a0)
                )
                assert overlap < 2e-2, (s, (a0, a1))


class TestSplitDB:
    def make_segments(self, labels, per_label=30, noise=250):
        segs = []
        for subset in ("training", "validation"):
            for label in labels:
                for k in range(per_label):
                    segs.append(
                        dict(
                            border=[0.0, 20.0],
                            segment=[5.0, 15.0],
                            label=label,
                            video_id=f"{subset[:2]}_{label}_{k}",
                            activitynet_duration=30.0,
                            activitynet_subset=subset,
                        )
                    )
        for k in range(noise):
            segs.append(
                dict(
                    border=[0.0, 30.0],
                    segment=[0.0, 30.0],
                    label=pipeline.NOISE_LABEL,
                    video_id=f"noise_{k}",
                    activitynet_duration=30.0,
                    activitynet_subset="training",
                )
            )
        return segs

    def test_split_structure(self):
        labels = [f"c{i}" for i in range(8)]
        train, val, test = labels[:4], labels[4:6], labels[6:]
        segs = self.make_segments(labels)
        db = pipeline.generate_split_db(segs, train, val, test)
        # training: base lose 10 to validation; novel truncated to 5
        for lab in train:
            assert len(db["training"][lab]) == 20
            assert len(db["validation"][lab]) == 10
        for lab in val:
            assert len(db["training"][lab]) == 5
            assert len(db["validation"][lab]) == 10
        for lab in test:
            assert len(db["training"][lab]) == 5
            assert lab not in db["validation"]
        # noise: 200 to validation, rest to training
        assert len(db["validation"][pipeline.NOISE_LABEL]) == 200
        assert len(db["training"][pipeline.NOISE_LABEL]) == 50
        # testing = all ActivityNet-validation segments
        for lab in labels:
            assert len(db["testing"][lab]) == 30

    def test_tags(self):
        labels = [f"c{i}" for i in range(8)]
        train, val, test = labels[:4], labels[4:6], labels[6:]
        db = pipeline.generate_split_db(self.make_segments(labels), train, val, test)
        for r in db["training"][train[0]]:
            assert r["is_query"] == -1 and r["retrieval_type"] == "base"
        for r in db["validation"][val[0]]:
            assert r["is_query"] == 1 and r["retrieval_type"] == "novel"
        for r in db["testing"][val[0]]:
            assert r["is_query"] == 0 and r["retrieval_type"] == "novel"
        for r in db["testing"][test[0]]:
            assert r["is_query"] == 1 and r["retrieval_type"] == "novel"
        for r in db["validation"][pipeline.NOISE_LABEL]:
            assert r["is_query"] == 0 and r["retrieval_type"] == "noise"

    def test_roundtrip_through_runtime_loader(self, tmp_path):
        """Generated DB must parse through the runtime TrimmedDB loader."""
        from vqwild_tpu.data.labels import SplitSpec
        from vqwild_tpu.data.schema import load_trimmed_db

        labels = [f"c{i}" for i in range(8)]
        train, val, test = labels[:4], labels[4:6], labels[6:]
        db = pipeline.generate_split_db(self.make_segments(labels), train, val, test)
        path = str(tmp_path / "db.json")
        pipeline.write_json(db, path)
        loaded = load_trimmed_db(path)
        spec = SplitSpec("t", tuple(train), tuple(val), tuple(test), path, "")
        c2i = loaded.cls2int(spec, novel_num=5)
        assert len(c2i) == 8


class TestMomentDB:
    def test_generate(self):
        anet, labels = synthetic_activitynet(nvid=30, seed=2)
        db = pipeline.generate_moment_db(anet, labels[:2], labels[2:3], labels[3:])
        nval_videos = sum(
            1 for v in anet["database"].values() if v["subset"] == "validation"
        )
        assert len(db["gallery"]) == nval_videos
        for g in db["gallery"]:
            assert g["segment"][0] == 0 and abs(
                g["segment"][1] - g["activitynet_duration"]
            ) < 1e-9
            assert "annotations" in g
        for q in db["query"]:
            assert q["segment"][1] - q["segment"][0] > 10.0
            if q["label"] in labels[:2]:
                assert q["retrieval_type"] == "base"
            elif q["label"] in labels[3:]:
                assert q["retrieval_type"] == "novel"
            else:
                assert "retrieval_type" not in q  # upstream leaves val unset

    def test_roundtrip_through_runtime_loader(self, tmp_path):
        from vqwild_tpu.data.schema import load_moment_db

        anet, labels = synthetic_activitynet(nvid=30, seed=2)
        db = pipeline.generate_moment_db(anet, labels[:2], labels[2:3], labels[3:])
        path = str(tmp_path / "untrimmed.json")
        pipeline.write_json(db, path)
        loaded = load_moment_db(path)
        assert len(loaded.gallery) == len(db["gallery"])
        assert all(g.annotations is not None for g in loaded.gallery)


class TestStatsReports:
    """datagen stats: the reference's design-analysis numbers
    (1_generate_trainvaltest.py:172-275, 2_generate_moment_test.py:56-159)
    recomputed from the emitted DB files."""

    def _spec(self):
        from vqwild_tpu.data.labels import SplitSpec

        return SplitSpec(
            name="t",
            train_labels=("a", "b"),
            val_labels=("v",),
            test_labels=("n",),
            db_json="",
            moment_db_json="",
        )

    def test_split_statistics_counts_and_hists(self):
        from vqwild_tpu.datagen import stats as st

        def rec(seg, border):
            return {"segment": list(seg), "border": list(border)}

        db = {
            "training": {
                "a": [rec((0, 30), (0, 60)), rec((0, 10), (0, 100))],
                "b": [rec((5, 55), (0, 100))],
                "v": [],
                "n": [],
                st.NOISE_LABEL: [rec((0, 20), (0, 20))] * 3,
            },
        }
        out = st.split_statistics(db, self._spec())
        tr = out["training"]
        assert tr["total_videos"] == 6
        assert tr["non_noise_videos"] == 3 and tr["noise_videos"] == 3
        assert tr["class_counts"]["base"] == {"a": 2, "b": 1}
        # fg durations 30, 10, 50 → bins [0,20):1 [20,40):1 [40,60):1
        assert tr["fg_duration_hist"]["counts"][:3] == [1, 1, 1]
        # fg/bg ratios 0.5, 0.1, 0.5 → bin [0.1,0.2):1, [0.5,0.6):2
        assert tr["fg_bg_ratio_hist"]["counts"][1] == 1
        assert tr["fg_bg_ratio_hist"]["counts"][5] == 2

    def test_moment_coverage_hand_golden(self):
        """One annotation, hand-checked against the reference's
        integer-snap formula (2_generate_moment_test.py:99-133)."""
        from vqwild_tpu.datagen import stats as st

        mdb = {
            "query": [{}] * 4,
            "gallery": [
                {
                    "activitynet_duration": 60.0,
                    # [7.5, 22.5) @ clip_sec=5 → clip idx [1.5, 4.5);
                    # best snap [1,5) or [2,4): iou = 3/4 or 2/3 → 0.75
                    "annotations": [{"segment": [7.5, 22.5], "label": "a"}],
                },
                {
                    "activitynet_duration": 100.0,
                    # 80s long @ clip_sec=5, cap 14 clips → 14*5/80 = 0.875
                    "annotations": [
                        {"segment": [10.0, 90.0], "label": "b"},
                        {"segment": [5.0, 5.0], "label": "a"},  # degenerate
                        {"segment": [0.0, 50.0], "label": "v"},  # val label
                    ],
                },
            ],
        }
        out = st.moment_coverage(
            mdb, val_labels=("v",), clip_secs=(5,), max_clips=(14,)
        )
        assert out["query_number"] == 4 and out["gallery_number"] == 2
        g = out["coverage_grid"][0]
        assert g["annotations"] == 2
        # ious {0.75, 0.875} → both > 0.5, one > 0.7... both > 0.7
        assert g["iou05"] == 1.0 and g["iou07"] == 1.0
        out2 = st.moment_coverage(
            mdb, val_labels=("v",), clip_secs=(5,), max_clips=(2,)
        )
        # cap 2 clips: short ann spans 3 clips > cap → 2/3 ≈ 0.667;
        # long ann → 2*5/80 = 0.125
        g2 = out2["coverage_grid"][0]
        assert g2["iou05"] == 0.5 and g2["iou07"] == 0.0

    def test_cli_stats_subcommand(self, tmp_path, capsys):
        import json as _json

        from vqwild_tpu.datagen.__main__ import main as dg_main

        sys_path_root = str(tmp_path)
        db = {
            "training": {"a": [], "b": [], "v": [], "n": []},
            "validation": {},
            "testing": {},
        }
        mdb = {"query": [], "gallery": []}
        dbp = f"{sys_path_root}/db.json"
        mp = f"{sys_path_root}/mdb.json"
        _json.dump(db, open(dbp, "w"))
        _json.dump(mdb, open(mp, "w"))
        outp = f"{sys_path_root}/report.json"
        dg_main(
            [
                "stats",
                "--db", dbp,
                "--untrimmed", mp,
                "--meta_split", "100_20_80",
                "--json_out", outp,
            ]
        )
        text = capsys.readouterr().out
        assert "clip moment statistics" in text
        report = _json.load(open(outp))
        assert "split" in report and "moment" in report
