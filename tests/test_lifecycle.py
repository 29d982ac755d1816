"""Full production-cycle integration: train → export → reimport → evaluate
→ serve. Each stage is covered by its own suite; this test proves the whole
lifecycle COMPOSES — checkpoint formats, variable templates, wire formats,
and the serving contract all line up end-to-end on the tiny fixture."""

import os

import numpy as np
import pytest

from tests.fixtures import build_tiny_arv


@pytest.fixture(scope="module")
def arv_root(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lifecycle"))
    build_tiny_arv(d)
    return d


def _cli(args):
    from vqwild_tpu.apps import cli

    return cli.main(args)


def test_train_export_eval_serve_cycle(arv_root):
    torch = pytest.importorskip("torch")
    run_dir = os.path.join(arv_root, "run")
    tiny = [
        "--frame_store", "synthetic", "--data_root", arv_root,
        "--input_size", "32", "--train_frame", "2", "--test_frame", "2",
        "--batch_size", "2", "--test_batch_size", "4", "--workers", "0",
    ]

    # 1. train (debug: 2 epochs x 2 steps), no mid-train eval
    _cli(["--method", "va", "--debug", "--run_dir", run_dir,
          "--eval_per_epoch", "99", *tiny])
    last = os.path.join(run_dir, "checkpoints", "last")
    assert os.path.isdir(last)

    # 2. export the orbax checkpoint as a reference best.pth.tar
    pth = os.path.join(arv_root, "exported.pth.tar")
    _cli(["--method", "va", "--test_load", last, "--export_torch", pth, *tiny])
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    # keys carry the module. prefix of the reference's DataParallel wrapper
    assert "state_dict" in ckpt and "module.visual_memory" in ckpt["state_dict"]

    # 3. evaluate FROM THE EXPORTED TORCH CHECKPOINT (torch-import path),
    #    trimmed regime on the yuv420 wire
    run2 = os.path.join(arv_root, "run_eval")
    _cli(["--method", "va", "--evaluate", "--test_load", pth,
          "--run_dir", run2, "--debug", "--wire", "yuv420", *tiny])
    import json

    with open(os.path.join(run2, "metrics", "evaluation.json")) as f:
        metrics = json.load(f)
    assert np.isfinite(metrics["trimmed"]["ap"])

    # 4. serve: gallery index from the same exported checkpoint + live query
    from vqwild_tpu.apps.cli import build_stack, load_variables, parse
    from vqwild_tpu.retrieval.features import FeatureExtractor, make_feat_fn
    from vqwild_tpu.serve.index import GalleryIndex
    from vqwild_tpu.serve.service import QueryService

    cfg, _ = parse(["--method", "va", "--wire", "yuv420", *tiny])
    _, db, store, model, params, state_vars, _, _ = build_stack(cfg)
    variables = load_variables(pth, "va", model, params, state_vars)
    feat_fn = make_feat_fn(model, variables, wire="yuv420")
    extractor = FeatureExtractor(
        feat_fn, store, test_frames=2, test_batch_size=4, input_size=32,
        wire="yuv420",
    )
    records = db.flat("testing")[:12]
    index = GalleryIndex.build(records, extractor)
    assert index.n == 12

    svc = QueryService(index, embed_fn=feat_fn, max_wait_ms=1.0)
    try:
        # query with the same record through the same extraction pipeline:
        # its own gallery row must rank first
        q = extractor.extract_trimmed([records[3]])[0]
        res = svc.query_features(q, k=3)
    finally:
        svc.close()
    assert res[0]["video_id"] == records[3].video_id
    assert res[0]["rank"] == 0 and len(res) == 3
