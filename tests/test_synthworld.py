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


@pytest.fixture(scope="module")
def semworld(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("semworld"))
    return build_synth_world(
        root, n_base=6, n_val=2, n_test=2, train_per_base=4, embed_dim=16,
        semantic=True, latent_dim=4, family_size=2, sibling_eps=0.3,
    )


def test_semantic_world_word_embeds_mirror_latents(semworld):
    """The vasa coupling: word-embed geometry == generative-latent geometry
    (semantic_word_embeddings lifts latents through an orthonormal Q)."""
    with open(semworld["semantics_path"]) as f:
        sem = json.load(f)
    lat = np.asarray(sem["latents"])
    with open(semworld["embed_path"]) as f:
        emb = json.load(f)
    W = np.asarray([emb[lab] for lab in semworld["labels"]])
    np.testing.assert_allclose(W @ W.T, lat @ lat.T, atol=1e-9)
    assert W.shape == (semworld["nclass"], semworld["embed_dim"])


def test_semantic_store_discovery_and_determinism(semworld):
    from vqwild_tpu.data.frames import load_synth_semantics, make_frame_store

    sem = load_synth_semantics(
        os.path.join(semworld["root"], "nonexistent_frames_subdir")
    )
    assert sem is not None and sem["latent_dim"] == 4
    st = make_frame_store("synthetic_class", semworld["root"])
    assert st.semantics is not None
    idx = np.arange(1, 9)
    a = st.read_frames("training", "sc003_00001", idx)
    b = make_frame_store("synthetic_class", semworld["root"]).read_frames(
        "training", "sc003_00001", idx
    )
    np.testing.assert_array_equal(a, b)
    # semantic textures differ from the legacy (uncoupled) renderer's
    legacy = ClassSyntheticFrameStore().read_frames(
        "training", "sc003_00001", idx
    )
    assert (a != legacy).mean() > 0.2


def test_semantic_siblings_are_confusable(semworld):
    """Novel siblings (shared family center) must be visually closer than
    cross-family classes — the ambiguity that breaks baseline saturation."""
    with open(semworld["semantics_path"]) as f:
        sem = json.load(f)
    st = ClassSyntheticFrameStore(semantics=sem)
    # classes 6,7 = first novel family; 8,9 = second (family_size=2)
    fams = sem["novel_family"]
    assert fams["6"] == fams["7"] and fams["8"] == fams["9"]
    assert fams["6"] != fams["8"]

    def loop_energy(cls):
        return st._class_loop(cls).astype(np.float32)

    sib = np.abs(loop_energy(6) - loop_energy(7)).mean()
    cross = np.abs(loop_energy(6) - loop_energy(8)).mean()
    assert sib < 0.7 * cross, (sib, cross)
    # latent geometry predicts the same ordering
    lat = np.asarray(sem["latents"])
    assert lat[6] @ lat[7] > lat[6] @ lat[8]


def test_legacy_world_unchanged_without_semantics(world):
    """No synth_semantics.json → the legacy renderer, byte-identical."""
    from vqwild_tpu.data.frames import make_frame_store

    st = make_frame_store("synthetic_class", world["root"])
    assert st.semantics is None
    idx = np.arange(1, 5)
    np.testing.assert_array_equal(
        st.read_frames("training", "sc001_00001", idx),
        ClassSyntheticFrameStore().read_frames("training", "sc001_00001", idx),
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
