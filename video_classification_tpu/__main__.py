"""Command-line interface.

The reference has no CLI: entry points are hand-edited ``if __name__`` blocks
(`train.py:405-419`, `train_sparse.py:250-253`, `run_data_preprocess.sh`). This CLI
exposes every workflow:

    python -m video_classification_tpu train slowfast-Torso [slowfast-HTAH ...]
    python -m video_classification_tpu train-parts
    python -m video_classification_tpu eval slowfast-HTAH
    python -m video_classification_tpu preprocess --root /data/ChaLearn
    python -m video_classification_tpu sparse-dump
    python -m video_classification_tpu sparse-train
    python -m video_classification_tpu v2-convert / v2-train
    python -m video_classification_tpu tools how-many-classes <labels.txt>

``--opts KEY VALUE ...`` merges dotted config overrides last, mirroring the yacs
3-layer merge.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _add_opts(p):
    p.add_argument("--opts", nargs="*", default=[],
                   help="config overrides: KEY VALUE [KEY VALUE ...]")
    p.add_argument("--root", default=None, help="shortcut for CHALEARN.ROOT")


def _cfg_for(name, args):
    from .config import load_model_cfg

    opts = list(args.opts)
    if args.root:
        opts = ["CHALEARN.ROOT", args.root] + opts
    return load_model_cfg(name, overrides=opts)


def main(argv=None):
    import os

    # Explicit platform pin (e.g. VCT_PLATFORM=cpu for host-side smoke runs).
    # Needed because environment-level plugin registration can re-add platforms
    # after JAX_PLATFORMS is read.
    plat = os.environ.get("VCT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    parser = argparse.ArgumentParser(prog="video_classification_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train one or more model configs in sequence")
    p.add_argument("models", nargs="+", help="config names, e.g. slowfast-Torso")
    p.add_argument("--warmstart", default=None,
                   help="torch .pyth/.ckpt pickle for the tier-3 Kinetics warm start")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a device trace of one warm epoch to DIR "
                        "(TensorBoard-loadable) before training starts")
    _add_opts(p)

    p = sub.add_parser("train-parts", help="train the 8 extra crop streams")
    _add_opts(p)

    p = sub.add_parser("train-parallel",
                       help="train streams concurrently, one per device group")
    p.add_argument("models", nargs="+", help="config names, e.g. the 6 streams")
    p.add_argument("--devices-per-stream", type=int, default=1)
    _add_opts(p)

    p = sub.add_parser("eval", help="run uniform-sampling eval for a config")
    p.add_argument("model")
    _add_opts(p)

    p = sub.add_parser("preprocess", help="run the offline preprocessing chain")
    p.add_argument("--stages", nargs="*", default=None,
                   help="subset: sample images flow energy pad iuv cse crop")
    p.add_argument("--sets", nargs="*", default=["train", "test", "valid"])
    p.add_argument("--provider", choices=["densepose", "synthetic"],
                   default="densepose")
    p.add_argument("--densepose-pkl", default=None,
                   help="detectron2 model_final_*.pkl for the densepose provider "
                        "(converted via detect/d2_convert)")
    _add_opts(p)

    p = sub.add_parser("sparse-dump", help="dump per-part eval materials")
    _add_opts(p)
    p = sub.add_parser("sparse-train", help="train the sparse fusion layer")
    _add_opts(p)

    p = sub.add_parser("v2-convert", help="run the v2 video-native converters")
    p.add_argument("--provider", choices=["densepose", "synthetic"],
                   default="densepose")
    p.add_argument("--densepose-pkl", default=None,
                   help="detectron2 pkl for the densepose provider")
    p.add_argument("--flow-method", choices=["variational", "raft"],
                   default="variational")
    p.add_argument("--raft-checkpoint", default=None,
                   help="torchvision raft_large .pth (converted via "
                        "models/raft_convert) for --flow-method raft")
    _add_opts(p)
    p = sub.add_parser("v2-train", help="train the v2 (5,2)-pathway model")
    p.add_argument("--model", default="slowfast-HTAH")
    _add_opts(p)

    p = sub.add_parser("infer", help="classify a raw gesture video (serving path)")
    p.add_argument("video", help="RGB (M_*) video file")
    p.add_argument("--depth", default=None, help="depth (K_*) video file")
    p.add_argument("--model", default="slowfast-HTAH",
                   help="stream config (ignored with --ensemble)")
    p.add_argument("--ensemble", action="store_true",
                   help="fuse the 5 part streams with the sparse-fusion ckpt")
    p.add_argument("--top-k", type=int, default=5)
    _add_opts(p)

    p = sub.add_parser("bench", help="run the throughput benchmark")

    p = sub.add_parser("tools")
    tool_sub = p.add_subparsers(dest="tool", required=True)
    t = tool_sub.add_parser("how-many-classes")
    t.add_argument("labels_txt")
    t = tool_sub.add_parser("render-iuv")
    t.add_argument("iuv_pkl")
    t.add_argument("video")
    t.add_argument("out_dir")

    args = parser.parse_args(argv)

    if args.cmd in ("train", "train-parts", "train-parallel", "eval"):
        # Multi-process SPMD entry (parallel/multihost): a no-op unless a
        # coordinator is configured (JAX_COORDINATOR_ADDRESS +
        # JAX_NUM_PROCESSES + JAX_PROCESS_ID, or TPU pod auto-detection).
        # Each process then runs this same CLI command; the Trainer feeds
        # per-host batch shards automatically.
        from .parallel.multihost import initialize_distributed

        if initialize_distributed():
            import jax

            print(f"multi-host: process {jax.process_index()}/"
                  f"{jax.process_count()}, {jax.local_device_count()} local "
                  f"of {jax.device_count()} devices")

    if args.cmd == "train":
        from .engine import Trainer

        warm = Path(args.warmstart) if args.warmstart else None
        for name in args.models:  # sequential multi-config loop (train.py:408-415)
            trainer = Trainer(_cfg_for(name, args), torch_warmstart=warm)
            if args.profile:
                from .utils.profiling import trace

                # One traced epoch (first run also captures compilation);
                # training then proceeds normally from the same state.
                with trace(Path(args.profile)):
                    trainer.train_epoch(0)
            trainer.train()
    elif args.cmd == "train-parts":
        from .engine import train_unimportant_parts

        cfg = _cfg_for("slowfast-HTAH", args)
        train_unimportant_parts(cfg_base=cfg)
    elif args.cmd == "train-parallel":
        from .engine import train_streams_parallel

        results = train_streams_parallel(
            args.models, cfg_overrides=_common_opts(args),
            devices_per_stream=args.devices_per_stream)
        for name, acc in results.items():
            print(f"{name}: best acc {acc:.4f}")
    elif args.cmd == "eval":
        from .engine import Trainer

        y = Trainer(_cfg_for(args.model, args)).run_eval()
        print(f"accuracy: {y['acc']:.4f}")
    elif args.cmd == "preprocess":
        _run_preprocess(args)
    elif args.cmd == "sparse-dump":
        from .engine import ResultSaver

        ResultSaver(cfg_overrides=_common_opts(args)).save_network_output()
    elif args.cmd == "sparse-train":
        from .engine import SparseTrainer

        SparseTrainer(_cfg_for("slowfast-HTAH", args)).train()
    elif args.cmd == "v2-convert":
        _run_v2_convert(args)
    elif args.cmd == "v2-train":
        from .v2 import V2Trainer

        V2Trainer(_cfg_for(args.model, args)).train()
    elif args.cmd == "infer":
        if args.ensemble:
            from .engine import EnsemblePredictor

            pred = EnsemblePredictor(cfg_overrides=_common_opts(args))
        else:
            from .engine import Predictor

            pred = Predictor(_cfg_for(args.model, args))
        y = pred.predict(args.video, args.depth, top_k=args.top_k)
        print(f"clips scored: {y['clips']}")
        for rank, (label, prob) in enumerate(y["top"], 1):
            print(f"#{rank}: class {label}  p={prob:.4f}")
    elif args.cmd == "bench":
        import bench

        bench.main()
    elif args.cmd == "tools":
        from . import tools

        if args.tool == "how-many-classes":
            tools.how_many_classes(Path(args.labels_txt))
        elif args.tool == "render-iuv":
            n = tools.render_iuv_boxes(Path(args.iuv_pkl), Path(args.video),
                                       Path(args.out_dir))
            print(f"wrote {n} frames")
    return 0


def _common_opts(args):
    opts = list(args.opts)
    if args.root:
        opts = ["CHALEARN.ROOT", args.root] + opts
    return opts


def _provider(kind, densepose_pkl=None):
    if kind == "synthetic":
        from .pipeline import SyntheticIUVProvider

        return SyntheticIUVProvider()
    from .detect import DensePoseIUVProvider

    return DensePoseIUVProvider(weights_pkl=densepose_pkl)


def _run_preprocess(args):
    from .pipeline import stages

    cfg = _cfg_for("slowfast-HTAH", args)
    sets = tuple(args.sets)
    todo = args.stages or ["sample", "images", "flow", "pad", "iuv", "crop"]
    if "sample" in todo:
        stages.sample_data(cfg, sets)
    if "images" in todo:
        stages.video_to_images(cfg)
    if "flow" in todo:
        stages.video_to_flow(cfg)
    if "energy" in todo:
        stages.filter_img_by_flow(cfg)
    if "pad" in todo:
        stages.image_to_padded(cfg)
    if "iuv" in todo:
        stages.padded_to_iuv(cfg, _provider(args.provider, args.densepose_pkl),
                             sets=sets)
    if "cse" in todo:
        stages.padded_to_cse(cfg, _provider(args.provider, args.densepose_pkl),
                             sets=sets)
    if "crop" in todo:
        stages.iuv_to_crop(cfg, sets=sets)


def _run_v2_convert(args):
    from .v2 import (
        ConvertIuvPklToPartBox,
        ConvertIuvPklToUvVideo,
        ConvertVideoToFlow,
        ConvertVideoToIUVPkl,
    )

    cfg = _cfg_for("slowfast-HTAH", args)
    ConvertVideoToFlow(cfg, method=args.flow_method,
                       raft_checkpoint=args.raft_checkpoint).convert()
    ConvertVideoToIUVPkl(cfg, _provider(args.provider, args.densepose_pkl)).convert()
    ConvertIuvPklToUvVideo(cfg).convert()
    ConvertIuvPklToPartBox(cfg).convert()


if __name__ == "__main__":
    sys.exit(main())
