"""Learnable synthetic world: class-textured frames + DB generator.

The world exists to drive the full reference recipe (run_all.sh:3-15) to
measurable convergence without ActivityNet on disk; these tests pin the
invariants that make it learnable and consistent: pixels are deterministic
functions of the video id, same-class videos share texture (discriminable
signal), and the DB annotations agree exactly with the frame renderer's
schedule.
"""

import json
import os

import numpy as np
import pytest

from vqwild_tpu.data.frames import (
    ClassSyntheticFrameStore,
    synth_schedule,
    synth_video_frames,
)
from vqwild_tpu.data.labels import NOISE_LABEL, get_split
from vqwild_tpu.data.schema import load_moment_db, load_trimmed_db
from vqwild_tpu.datagen.synthworld import FPS, build_synth_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthworld"))
    return build_synth_world(root, n_base=6, n_val=2, n_test=2,
                             train_per_base=4, embed_dim=16)


def test_store_deterministic_and_shaped():
    st = ClassSyntheticFrameStore()
    idx = np.arange(1, 17)
    a = st.read_frames("training", "sc003_00001", idx)
    b = ClassSyntheticFrameStore().read_frames("training", "sc003_00001", idx)
    assert a.shape == (16, 128, 171, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    # motion: consecutive frames differ
    assert (a[0] != a[1]).mean() > 0.5


def test_class_signal_discriminable():
    """Translation-invariant spectra: same-class closer than cross-class."""
    st = ClassSyntheticFrameStore()

    def spectrum(vid):
        f = st.read_frames("training", vid, np.arange(1, 9))
        g = f.astype(np.float32).mean(axis=(0, 3))
        F = np.abs(np.fft.rfft2(g - g.mean()))
        F[0, 0] = 0.0
        F = F.ravel()
        return F / np.linalg.norm(F)

    same = spectrum("sc003_00001") @ spectrum("sc003_00002")
    cross = spectrum("sc003_00001") @ spectrum("sc007_00003")
    assert same > cross + 0.15, (same, cross)


def test_schedule_bounds_and_determinism():
    vid = "sg024_00007"
    segs = synth_schedule(vid, 24)
    assert segs == synth_schedule(vid, 24)
    n = synth_video_frames(vid)
    prev_end = -1
    for f0, f1, cls in segs:
        assert 0 <= f0 < f1 <= n
        assert f1 - f0 >= 15  # >= 5 s at fps 3
        assert f0 > prev_end  # non-overlapping, gapped
        assert 0 <= cls < 24
        prev_end = f1


def test_world_schema_roundtrip(world):
    spec = get_split(world["spec_path"])
    assert spec.name == "synth"
    assert len(spec.all_labels) == world["nclass"]
    db = load_trimmed_db(spec.db_json)
    # every split carries every label + noise
    for split in ("training", "validation", "testing"):
        assert set(db.splits[split]) == set(spec.all_labels) | {NOISE_LABEL}
    # few-shot map has exactly nclass entries
    assert len(db.cls2int(spec, novel_num=3)) == world["nclass"]

    mdb = load_moment_db(spec.moment_db_json)
    covered = {a.label for g in mdb.gallery for a in g.annotations}
    assert covered == set(spec.all_labels)  # evaluator completeness assert
    for q in mdb.nonnoise_queries():
        assert q.segment[1] - q.segment[0] > 10.0  # valid moment queries


def test_annotations_match_rendered_schedule(world):
    """The frames a gallery video renders and the labels its DB record
    carries must come from the same deterministic schedule."""
    mdb = load_moment_db(world["moment_path"])
    g = mdb.gallery[0]
    segs = synth_schedule(g.video_id, world["nclass"])
    assert len(g.annotations) == len(segs)
    for ann, (f0, f1, cls) in zip(g.annotations, segs):
        assert ann.label == world["labels"][cls]
        np.testing.assert_allclose(ann.segment, [f0 / FPS, f1 / FPS])
    # record duration consistent with the store's frame count
    st = ClassSyntheticFrameStore()
    assert st.num_frames("validation", g.video_id) == round(
        g.activitynet_duration * FPS
    )


def test_cli_accepts_split_file(world):
    from vqwild_tpu.apps.cli import parse

    cfg, _ = parse([
        "--meta_split", world["spec_path"],
        "--frame_store", "synthetic_class",
        "--semantic_json", world["embed_path"],
    ])
    assert cfg.data.nclass == world["nclass"]
    assert cfg.model.nclass == world["nclass"]
    assert cfg.model.semantic_dim == world["embed_dim"]
