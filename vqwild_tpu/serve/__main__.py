"""Serving entry point.

Build an index from a checkpoint + ARV DB, or load a prebuilt one, then
answer queries over HTTP:

  # build + save an index, then serve it
  python -m vqwild_tpu.serve --test_load <ckpt> --meta_split 100_20_80 \
      --data_root data --index_dir gallery_index --port 8080

  # serve a prebuilt index (no model/frames needed for feature queries)
  python -m vqwild_tpu.serve --index_dir gallery_index --no_embed --port 8080

No reference counterpart (batch-eval scripts only, run_all.sh).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="ARV gallery query server")
    p.add_argument("--index_dir", required=True,
                   help="gallery index directory (loaded if it exists, "
                        "otherwise built from the DB + checkpoint and saved)")
    p.add_argument("--test_load", default="", help="checkpoint for the embed trunk")
    p.add_argument("--method", default="baseline", choices=["baseline", "va", "vasa"])
    p.add_argument("--meta_split", default="100_20_80")
    p.add_argument("--data_root", default="data")
    p.add_argument("--frame_store", default="jpeg",
                   choices=["jpeg", "packed", "packed_yuv", "synthetic"])
    p.add_argument("--frames_dir", default="")
    p.add_argument("--eval_split", default="testing",
                   choices=["validation", "testing"])
    p.add_argument("--input_size", type=int, default=112)
    p.add_argument("--test_frame", type=int, default=32)
    p.add_argument("--test_batch_size", type=int, default=30)
    p.add_argument("--trunk_int8", action="store_true",
                   help="serve the int8 PTQ trunk (models/quant.py)")
    p.add_argument("--no_embed", action="store_true",
                   help="feature queries only (no model load)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--k", type=int, default=30)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    args = p.parse_args(argv)

    from vqwild_tpu.core.logging import get_logger
    from vqwild_tpu.serve.http import make_server
    from vqwild_tpu.serve.index import GalleryIndex
    from vqwild_tpu.serve.service import QueryService

    log = get_logger("serve")

    embed_fn = None
    if not args.no_embed:
        embed_fn = _build_embed_fn(args)

    if os.path.exists(os.path.join(args.index_dir, "feats.npy")):
        index = GalleryIndex.load(args.index_dir)
        log.info("loaded index: %d gallery rows", index.n)
    else:
        index = _build_index(args, embed_fn)
        index.save(args.index_dir)

    service = QueryService(
        index, embed_fn=embed_fn, default_k=args.k,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    server = make_server(service, host=args.host, port=args.port)
    log.info("serving %d gallery rows on http://%s:%d", index.n,
             args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()


def _cfg(args):
    from vqwild_tpu.core.config import (
        DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )

    data = DataConfig(
        meta_split=args.meta_split,
        data_root=args.data_root,
        frames_dir=args.frames_dir
        or os.path.join(args.data_root, "activitynet1.3_train_val_frames_fps3"),
        input_size=args.input_size,
        test_frame=args.test_frame,
        test_batch_size=args.test_batch_size,
        frame_store=args.frame_store,
    )
    model = ModelConfig(method=args.method)
    ev = EvalConfig(
        eval_split=args.eval_split, wire="yuv420",
        trunk_quant="int8" if args.trunk_int8 else None,
    )
    return ExperimentConfig(data=data, model=model, train=TrainConfig(), eval=ev)


def _build_embed_fn(args):
    """The serving trunk with the feat_fn contract: f(y, uv) → [B, C, T]."""
    from vqwild_tpu.apps.cli import build_stack, load_variables
    from vqwild_tpu.retrieval.features import make_feat_fn

    cfg = _cfg(args)
    _, _, _, model, params, state_vars, _, _ = build_stack(cfg)
    variables = load_variables(args.test_load, cfg.model.method, model, params,
                               state_vars)
    return make_feat_fn(model, variables, wire="yuv420",
                        quant=cfg.eval.trunk_quant)


def _build_index(args, embed_fn):
    from vqwild_tpu.apps.cli import build_stack
    from vqwild_tpu.retrieval.features import FeatureExtractor
    from vqwild_tpu.serve.index import GalleryIndex

    if embed_fn is None:
        raise SystemExit("--no_embed requires an existing --index_dir")
    cfg = _cfg(args)
    spec, db, store, *_ = build_stack(cfg)
    extractor = FeatureExtractor(
        embed_fn, store,
        test_frames=cfg.data.test_frame,
        test_batch_size=cfg.data.test_batch_size,
        input_size=cfg.data.input_size,
        wire="yuv420",
    )
    records = db.flat(args.eval_split)
    return GalleryIndex.build(records, extractor)


if __name__ == "__main__":
    main()
