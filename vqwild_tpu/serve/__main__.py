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
    p.add_argument("--regime", default="trimmed",
                   choices=["trimmed", "clip", "moment"],
                   help="what the index rows are: trimmed segments, "
                        "untrimmed clip windows, or untrimmed moment "
                        "windows (adds /query/moments)")
    p.add_argument("--clip_sec", type=int, default=6)
    p.add_argument("--moment_clip_sec", type=int, default=5)
    p.add_argument("--max_clips_per_moment", type=int, default=26)
    p.add_argument("--max_gallery", type=int, default=0,
                   help="cap gallery records/videos at index-build time "
                        "(0 = all; debug/smoke aid like the eval debug caps)")
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
    from vqwild_tpu.serve.index import GalleryIndex, MomentIndex
    from vqwild_tpu.serve.service import QueryService

    log = get_logger("serve")

    embed_fn = None
    if not args.no_embed:
        embed_fn = _build_embed_fn(args)

    moment = args.regime == "moment"
    cls = MomentIndex if moment else GalleryIndex
    if os.path.exists(os.path.join(args.index_dir, "feats.npy")):
        # a saved moment index is recognizable by its windows.npz
        moment = os.path.exists(os.path.join(args.index_dir, "windows.npz"))
        cls = MomentIndex if moment else GalleryIndex
        index = cls.load(args.index_dir)
        log.info("loaded %s index: %d rows", "moment" if moment else "gallery",
                 index.n)
    else:
        index = _build_index(args, embed_fn)
        index.save(args.index_dir)

    service = QueryService(
        index, embed_fn=embed_fn, default_k=args.k,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        moment_index=index if moment else None,
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
    from vqwild_tpu.models.quant import calibration_path

    return make_feat_fn(model, variables, wire="yuv420",
                        quant=cfg.eval.trunk_quant,
                        calib_path=calibration_path(args.test_load))


def _build_index(args, embed_fn):
    from vqwild_tpu.apps.cli import build_stack, resolve_data_file
    from vqwild_tpu.data.schema import load_moment_db
    from vqwild_tpu.retrieval.features import FeatureExtractor
    from vqwild_tpu.serve.index import GalleryIndex, MomentIndex

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
    cap = args.max_gallery or None
    if args.regime == "trimmed":
        return GalleryIndex.build(db.flat(args.eval_split)[:cap], extractor)

    mdb = load_moment_db(resolve_data_file(spec.moment_db_json, args.data_root))
    if args.regime == "clip":
        from vqwild_tpu.retrieval.clip import ARVRetrievalClip

        ev = ARVRetrievalClip(mdb, spec, extractor, clip_sec=args.clip_sec)
        ev.gallery_videos = ev.gallery_videos[:cap]
        feats, labels, vidx, locs = ev.build_gallery()
        meta = [
            {
                "video_id": ev.gallery_videos[int(vidx[i])].video_id,
                "label": str(labels[i]),
                "loc_sec": [float(locs[i, 0]), float(locs[i, 1])],
            }
            for i in range(feats.shape[0])
        ]
        return GalleryIndex(feats, meta)

    from vqwild_tpu.retrieval.moment import ARVRetrievalMoment

    ev = ARVRetrievalMoment(
        mdb, spec, extractor,
        moment_clip_sec=args.moment_clip_sec,
        max_clips_per_moment=args.max_clips_per_moment,
    )
    ev.gallery_videos = ev.gallery_videos[:cap]
    feats, vidx, s_sec, e_sec, _, _ = ev.build_gallery()
    video_ids = [v.video_id for v in ev.gallery_videos]
    return MomentIndex(feats, video_ids, vidx, s_sec, e_sec)


if __name__ == "__main__":
    main()
