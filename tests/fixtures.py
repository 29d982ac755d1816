"""Synthetic tiny-ARV dataset fixtures mirroring the shipped JSON schemas."""

from __future__ import annotations

import json
import os

import numpy as np

from vqwild_tpu.data.labels import NOISE_LABEL, SplitSpec

BASE = ["juggling", "archery", "kayaking", "welding"]
VAL_NOVEL = ["curling", "fencing"]
TEST_NOVEL = ["bowling", "surfing"]
ALL_LABELS = BASE + VAL_NOVEL + TEST_NOVEL

VIDEO_FRAMES = 64  # SyntheticFrameStore default
FPS = 3
VIDEO_DURATION = VIDEO_FRAMES / FPS


def _record(video_id, label, subset, seg, is_query=0, rtype="base", annotations=None):
    r = dict(
        video_id=video_id,
        label=label,
        segment=list(seg),
        border=list(seg),
        activitynet_subset=subset,
        activitynet_duration=VIDEO_DURATION,
        is_query=is_query,
        retrieval_type=rtype,
    )
    if annotations is not None:
        r["annotations"] = annotations
    return r


def build_tiny_arv(root: str):
    rng = np.random.default_rng(0)

    def seg(i):
        start = float(1 + (i % 3))
        return (start, start + 10.0 + (i % 4))

    trimmed = {"training": {}, "validation": {}, "testing": {}}
    vid_counter = [0]

    def new_vid(prefix):
        vid_counter[0] += 1
        return f"{prefix}{vid_counter[0]:04d}"

    # training split: base classes 6 videos, novel classes 8 (to exercise
    # novel_num truncation), plus distractor noise
    for label in ALL_LABELS:
        n = 6 if label in BASE else 8
        trimmed["training"][label] = [
            _record(new_vid("tr"), label, "training", seg(i)) for i in range(n)
        ]
    trimmed["training"][NOISE_LABEL] = [
        _record(new_vid("tr"), NOISE_LABEL, "training", seg(i), rtype="noise")
        for i in range(4)
    ]

    # validation/testing splits: every class present, >=3 queries per class
    for split, subset in (("validation", "validation"), ("testing", "validation")):
        for label in ALL_LABELS:
            rtype = "base" if label in BASE else "novel"
            recs = []
            for i in range(8):
                recs.append(
                    _record(
                        new_vid("ev"),
                        label,
                        subset,
                        seg(i),
                        is_query=1 if i < 3 else 0,
                        rtype=rtype,
                    )
                )
            trimmed[split][label] = recs
        trimmed[split][NOISE_LABEL] = [
            _record(new_vid("ev"), NOISE_LABEL, subset, seg(i), is_query=-1, rtype="noise")
            for i in range(3)
        ]

    os.makedirs(root, exist_ok=True)
    db_path = os.path.join(root, "arv_db_tiny.json")
    with open(db_path, "w") as f:
        json.dump(trimmed, f)

    # moment DB: queries = trimmed segments; gallery = whole videos with
    # annotation lists (1-2 annotations each)
    queries = []
    for label in ALL_LABELS:
        rtype = "base" if label in BASE else "novel"
        for i in range(3):
            queries.append(
                _record(new_vid("q"), label, "validation", seg(i), rtype=rtype)
            )
    queries.append(
        _record(new_vid("q"), NOISE_LABEL, "validation", seg(0), rtype="noise")
    )
    gallery = []
    for gi in range(16):
        label = ALL_LABELS[gi % len(ALL_LABELS)]
        anns = [{"segment": [4.0, 16.0], "label": label}]
        if gi % 3 == 0:
            other = ALL_LABELS[(gi + 3) % len(ALL_LABELS)]
            anns.append({"segment": [0.0, 4.0], "label": other})
        gallery.append(
            _record(
                new_vid("g"),
                "",
                "validation",
                (0.0, VIDEO_DURATION),
                annotations=anns,
            )
        )
    moment_path = os.path.join(root, "arv_db_tiny_untrimmed.json")
    with open(moment_path, "w") as f:
        json.dump({"query": queries, "gallery": gallery}, f)

    # word embeddings, d16
    dim = 16
    embeds = {
        label: rng.normal(size=dim).tolist() for label in ALL_LABELS
    }
    embed_path = os.path.join(root, "wordembed_tiny_d200.json".replace("200", str(dim)))
    with open(embed_path, "w") as f:
        json.dump(embeds, f)

    spec = SplitSpec(
        name="tiny",
        train_labels=tuple(BASE),
        val_labels=tuple(VAL_NOVEL),
        test_labels=tuple(TEST_NOVEL),
        db_json=db_path,
        moment_db_json=moment_path,
    )
    return dict(
        root=root,
        spec=spec,
        db_path=db_path,
        moment_path=moment_path,
        embed_path=embed_path,
        embed_dim=dim,
        nclass=len(ALL_LABELS),
        labels=ALL_LABELS,
    )


def fake_resnet18_2d_state_dict(seed=0):
    """A shape-faithful torchvision-resnet18 (2D, ImageNet-layout) state dict
    with random values — stands in for the real pretrained weights (not
    downloadable here). torch tensors, torchvision key naming."""
    import numpy as np
    import torch

    rng = np.random.default_rng(seed)

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    sd = {"conv1.weight": t(64, 3, 7, 7)}
    sd |= {"bn1.weight": t(64), "bn1.bias": t(64),
           "bn1.running_mean": t(64), "bn1.running_var": abs(t(64)) + 0.5}
    inplanes = 64
    for li, planes in enumerate([64, 128, 256, 512], start=1):
        for bi in range(2):
            pre = f"layer{li}.{bi}"
            sd[f"{pre}.conv1.weight"] = t(planes, inplanes if bi == 0 else planes, 3, 3)
            sd[f"{pre}.conv2.weight"] = t(planes, planes, 3, 3)
            for bn in ("bn1", "bn2"):
                sd |= {f"{pre}.{bn}.weight": t(planes), f"{pre}.{bn}.bias": t(planes),
                       f"{pre}.{bn}.running_mean": t(planes),
                       f"{pre}.{bn}.running_var": abs(t(planes)) + 0.5}
            if li > 1 and bi == 0:
                sd[f"{pre}.downsample.0.weight"] = t(planes, inplanes, 1, 1)
                sd |= {f"{pre}.downsample.1.weight": t(planes),
                       f"{pre}.downsample.1.bias": t(planes),
                       f"{pre}.downsample.1.running_mean": t(planes),
                       f"{pre}.downsample.1.running_var": abs(t(planes)) + 0.5}
        inplanes = planes
    sd["fc.weight"] = t(1000, 512)
    sd["fc.bias"] = t(1000)
    return sd
