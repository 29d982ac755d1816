"""Learnable synthetic ARV world — end-to-end recipe validation without
ActivityNet on disk.

The reference's de-facto integration test is "run the real pipeline"
(run_all.sh:3-15); with ActivityNet frames absent in this environment the
equivalent is a procedurally generated world whose *pixels carry the class
signal*: every class owns a texture loop, every video a private warp of it
(data/frames.py:ClassSyntheticFrameStore), and the DB JSONs emitted here
agree exactly with those deterministic functions — so the full CLI recipe
(triplet CE training → trimmed/clip/moment retrieval eval → best-checkpoint
selection) can be driven to measurable convergence.

Emits into ``out_dir``:
  arv_db_synth.json            trimmed split DB (schema of arv_db_*.json)
  arv_db_synth_untrimmed.json  moment DB (v1 runtime schema)
  wordembed_synth_d{D}.json    random unit-free class embeddings (vasa)
  synth_split.json             SplitSpec file for --meta_split <path>
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from vqwild_tpu.data.frames import synth_schedule, synth_video_frames
from vqwild_tpu.data.labels import NOISE_LABEL

FPS = 3


def _label(i: int) -> str:
    return f"synth_{i:03d}"


def _record(video_id, label, subset, seg, is_query=0, rtype="base",
            annotations=None):
    duration = synth_video_frames(video_id) / FPS
    r = dict(
        video_id=video_id,
        label=label,
        segment=[float(seg[0]), float(seg[1])],
        border=[float(seg[0]), float(seg[1])],
        activitynet_subset=subset,
        activitynet_duration=duration,
        is_query=is_query,
        retrieval_type=rtype,
    )
    if annotations is not None:
        r["annotations"] = annotations
    return r


def _class_video(cls: int, counter: List[int], subset, is_query=0,
                 rtype="base"):
    counter[0] += 1
    vid = f"sc{cls:03d}_{counter[0]:05d}"
    duration = synth_video_frames(vid) / FPS
    # whole tape is class content; segment = essentially the full video,
    # kept >10.5 s so every record is also a valid moment query
    seg = (0.5, max(11.0, duration - 0.3))
    return _record(vid, _label(cls), subset, seg, is_query, rtype)


def _noise_video(counter: List[int], subset, is_query=0):
    counter[0] += 1
    vid = f"sn_{counter[0]:05d}"
    duration = synth_video_frames(vid) / FPS
    return _record(vid, NOISE_LABEL, subset, (0.5, duration - 0.3),
                   is_query, "noise")


def build_synth_world(
    out_dir: str,
    n_base: int = 16,
    n_val: int = 4,
    n_test: int = 4,
    train_per_base: int = 12,
    train_per_novel: int = 8,
    eval_per_class: int = 6,
    queries_per_class: int = 3,
    n_noise_train: int = 12,
    n_noise_eval: int = 4,
    min_gallery: int = 24,
    embed_dim: int = 64,
    seed: int = 0,
) -> Dict:
    ncls = n_base + n_val + n_test
    labels = [_label(i) for i in range(ncls)]
    base = labels[:n_base]
    val_novel = labels[n_base:n_base + n_val]
    test_novel = labels[n_base + n_val:]
    counter = [0]

    trimmed = {"training": {}, "validation": {}, "testing": {}}
    for cls, label in enumerate(labels):
        n = train_per_base if label in base else train_per_novel
        trimmed["training"][label] = [
            _class_video(cls, counter, "training") for _ in range(n)
        ]
    trimmed["training"][NOISE_LABEL] = [
        _noise_video(counter, "training") for _ in range(n_noise_train)
    ]

    for split in ("validation", "testing"):
        for cls, label in enumerate(labels):
            rtype = "base" if label in base else "novel"
            trimmed[split][label] = [
                _class_video(cls, counter, "validation",
                             is_query=1 if i < queries_per_class else 0,
                             rtype=rtype)
                for i in range(eval_per_class)
            ]
        trimmed[split][NOISE_LABEL] = [
            _noise_video(counter, "validation", is_query=-1)
            for _ in range(n_noise_eval)
        ]

    # moment DB: queries = per-class trimmed segments (>10 s by
    # construction); gallery = untrimmed sg videos whose annotation lists
    # are exactly synth_schedule() — grown until every class is covered
    # (the evaluators assert gallery class-completeness,
    # dataloader_baseline.py:862-870, :1186-1194)
    queries = []
    for cls, label in enumerate(labels):
        rtype = "base" if label in base else "novel"
        for _ in range(queries_per_class):
            queries.append(
                _class_video(cls, counter, "validation", rtype=rtype)
            )
    queries.append(_noise_video(counter, "validation"))

    gallery, covered, gi = [], set(), 0
    while gi < min_gallery or len(covered) < ncls:
        gi += 1
        if gi > min_gallery + 40 * ncls:  # deterministic, but bound it
            raise RuntimeError("gallery class coverage did not close")
        vid = f"sg{ncls:03d}_{gi:05d}"
        anns = []
        for f0, f1, cls in synth_schedule(vid, ncls):
            anns.append(
                {"segment": [f0 / FPS, f1 / FPS], "label": _label(cls)}
            )
            covered.add(cls)
        if not anns:
            continue
        duration = synth_video_frames(vid) / FPS
        gallery.append(
            _record(vid, "", "validation", (0.0, duration), annotations=anns)
        )

    rng = np.random.default_rng(seed)
    embeds = {
        label: rng.normal(size=embed_dim).tolist() for label in labels
    }

    os.makedirs(out_dir, exist_ok=True)
    db_path = os.path.join(out_dir, "arv_db_synth.json")
    moment_path = os.path.join(out_dir, "arv_db_synth_untrimmed.json")
    embed_path = os.path.join(out_dir, f"wordembed_synth_d{embed_dim}.json")
    spec_path = os.path.join(out_dir, "synth_split.json")
    with open(db_path, "w") as f:
        json.dump(trimmed, f)
    with open(moment_path, "w") as f:
        json.dump({"query": queries, "gallery": gallery}, f)
    with open(embed_path, "w") as f:
        json.dump(embeds, f)
    with open(spec_path, "w") as f:
        json.dump(
            dict(
                name="synth",
                train_labels=base,
                val_labels=val_novel,
                test_labels=test_novel,
                db_json="arv_db_synth.json",
                moment_db_json="arv_db_synth_untrimmed.json",
            ),
            f,
        )
    return dict(
        root=out_dir,
        spec_path=spec_path,
        db_path=db_path,
        moment_path=moment_path,
        embed_path=embed_path,
        embed_dim=embed_dim,
        nclass=ncls,
        labels=labels,
        n_gallery=len(gallery),
    )
