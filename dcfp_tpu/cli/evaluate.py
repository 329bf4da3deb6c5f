"""Validation entry point (reference evaluate.py parity): mIoU /
per-class IU / precision / recall + FPS on the val split; whole-image,
sliding-window, multi-scale + flip; boundary IoU; optional prediction
PNGs; results appended to ``result.txt``.

Example (Cityscapes single-scale whole-image, scripts/cs/finetune.sh:35):
  python -m dcfp_tpu.cli.evaluate --dataset CS --data-dir val \\
      --model deeplabv3 --backbone resnet50 \\
      --backbone-para '{"os":8,"mg_unit":[1,2,4]}' \\
      --whole true --ms 1 --restore-from snapshots/.../CS_scenes_36000.msgpack \\
      --channel-cfg snapshots/cs_prune/channel_cfg.msgpack
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.cli.common import (add_data_args, add_distributed_args,
                                 add_model_args, build_dataset_from_args,
                                 build_model_from_args, json_para,
                                 maybe_initialize_distributed,
                                 maybe_load_channel_cfg, parse_hw, str2bool)
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dcfp_tpu evaluate")
    add_data_args(p, split="val")
    add_model_args(p)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--restore-from", type=str, required=True)
    p.add_argument("--whole", type=str2bool, default=False,
                   help="whole-image (vs sliding-window tiles)")
    p.add_argument("--flip", type=str2bool, default=False)
    p.add_argument("--ms", type=str, default="1",
                   help="comma-joined scales, e.g. '0.75,1,1.25'")
    p.add_argument("--iou-type", type=str, default="segm",
                   help="segm|boundary")
    p.add_argument("--dilation-ratio", type=float, default=0.02)
    p.add_argument("--save-predict", type=str2bool, default=False)
    p.add_argument("--predict-dir", type=str, default=None)
    p.add_argument("--result-file", type=str, default=None,
                   help="defaults to <ckpt dir>/result.txt")
    p.add_argument("--dtype", type=str, default="float32",
                   help="float32|bfloat16 inference")
    p.add_argument("--use-aot", type=str2bool, default=False,
                   help="serve serialized AOT executables (deploy.py "
                        "export; the --use-trt analog).  Modes: whole-"
                        "image ss (argmax export), sliding-window with "
                        "any ms/flip (tile-shaped --output logits "
                        "export), whole-image ms/flip (per-scale logits "
                        "set from deploy --ms)")
    p.add_argument("--aot-path", type=str, default=None)
    p.add_argument("--pipeline", type=str2bool, default=False,
                   help="throughput mode for whole-image ss eval: keep "
                        "the H2D copy, forward, argmax and confusion "
                        "update on device with NO per-image host sync "
                        "(the protocol loop brackets each image with a "
                        "host fetch, reference evaluate.py:327-337 — "
                        "over a tunneled chip that floors FPS at the "
                        "round-trip latency).  mIoU is identical; FPS "
                        "becomes the pipelined loop's wall-clock")
    p.add_argument("--compact", type=str2bool, default=False,
                   help="raw uint8 val items, normalized on device "
                        "(bitwise-equal metrics): 4x less host->device "
                        "traffic per image — pairs well with --pipeline "
                        "on remote/tunneled chips and cuts PCIe "
                        "pressure on attached ones")
    p.add_argument("--bucket-quantum", type=int, default=0,
                   help="pad inputs up to multiples of this so variable-"
                        "resolution val sets compile a bounded program "
                        "set (0 = one program per distinct shape)")
    p.add_argument("--eval-shard", type=str, default="none",
                   help="none|data|spatial|both: run the forward over a "
                        "device mesh (spatial = whole-image multi-chip "
                        "inference)")
    p.add_argument("--num-devices", type=int, default=0,
                   help="devices for --eval-shard (0 = all)")
    p.add_argument("--spatial-shards", type=int, default=1)
    add_distributed_args(p)
    return p


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)
    maybe_initialize_distributed(args)  # before any other jax call
    from dcfp_tpu.data.loader import EvalLoader
    from dcfp_tpu.engine.evaluator import Predictor, evaluate
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.prune.pruner import apply_channel_cfg
    from dcfp_tpu.utils import checkpoint as ckpt

    dataset = build_dataset_from_args(args, args.data_dir,
                                      compact=args.compact)
    normalize = ((dataset.mean, dataset.std) if args.compact else None)
    # each process evaluates its stride of the split; confusion matrices
    # sum across processes at the end (reference DistributedSampler +
    # dist.all_reduce, evaluate.py:370-372)
    loader = EvalLoader(dataset, batch_size=args.batch_size,
                        rank=jax.process_index(),
                        world=jax.process_count(),
                        num_workers=args.num_workers)

    model = build_model_from_args(args, dataset.num_classes, deepsup=False)
    graph = model.graph
    cfg = maybe_load_channel_cfg(args)
    if cfg is not None:
        graph = apply_channel_cfg(graph, cfg)
    params, bn_state = init_graph(graph, jax.random.key(0))
    params, bn_state = ckpt.load_params_non_strict(args.restore_from,
                                                   params, bn_state)

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.dtype]
    scales_chk = [float(s) for s in args.ms.split(",") if s]
    # serving modes (the reference feeds its TRT engine to every eval
    # mode, evaluate.py:273-276):
    # * whole-image ss        -> one argmax executable (deploy default)
    # * sliding (any ms/flip) -> one tile-shaped logits executable;
    #   every tile runs at the canonical tile shape regardless of scale
    # * whole-image ms/flip   -> per-scale logits executables
    #   (deploy --ms), dispatched by the scaled input shape
    aot_whole = args.whole and scales_chk == [1.0] and not args.flip
    aot_sliding = not args.whole
    aot_ms = args.whole and not aot_whole
    if args.use_aot and (aot_whole or aot_ms) and (args.longsize > 0
                                                   or args.shortsize > 0):
        # whole-ss: the resize protocol argmaxes AFTER resizing logits
        # back to the original resolution (reference evaluate.py:340-343);
        # an argmax executable emits labels, which cannot be bilinear-
        # resized.  whole-ms: per-scale executables are exported at fixed
        # shapes derived from --input-size, but the resize protocol gives
        # each image its own resized+padded shape — the dispatch-by-shape
        # lookup would fail mid-eval on the first mismatched image
        raise SystemExit(
            "--use-aot whole-image serving cannot run the longsize/"
            "shortsize resize protocol (ss exports emit argmax labels, "
            "which cannot be logits-resized; ms exports are fixed-shape "
            "per scale, but the resize protocol produces per-image "
            "shapes) — drop --longsize/--shortsize or use the jit path")
    if args.use_aot:
        if not args.aot_path:
            raise SystemExit("--use-aot requires --aot-path "
                             "(the serialized executable from cli.deploy)")
        if not os.path.isfile(args.aot_path):
            raise SystemExit(f"--aot-path not found: {args.aot_path}")
        # the artifact was exported with BN-folded deploy params saved
        # next to it by the deploy CLI
        aot_dir = os.path.dirname(os.path.abspath(args.aot_path))
        params_path = os.path.join(aot_dir, "deploy_params.msgpack")
        if not os.path.isfile(params_path):
            raise SystemExit(
                f"missing {params_path} (written by cli.deploy next to "
                "the serialized executable)")
        meta_path = os.path.join(aot_dir, "meta.json")
        meta = None
        aot_fmt = "nhwc"
        if os.path.isfile(meta_path):
            import json
            with open(meta_path) as f:
                meta = json.load(f)
            want_out = "argmax" if aot_whole else "logits"
            if meta.get("output") != want_out:
                raise SystemExit(
                    f"this eval mode needs a deploy --output {want_out} "
                    f"export; {args.aot_path} was exported with "
                    f"--output {meta.get('output')}")
            aot_fmt = meta.get("input_format", "nhwc")
            if aot_sliding and aot_fmt != "nhwc":
                raise SystemExit(
                    "tile executables must be exported with "
                    "--input-format nhwc (the tile extractor feeds NHWC)")
            if aot_sliding and (tuple(meta["input"][1:3])
                                != parse_hw(args.input_size)):
                raise SystemExit(
                    f"tile executable shape {meta['input'][1:3]} != "
                    f"--input-size {args.input_size}")
        from dcfp_tpu.engine.deploy import load_serialized
        aot_params = ckpt.load_pytree(params_path)
        aot_params = jax.tree.map(jnp.asarray, aot_params)
        predictor = Predictor(graph, params, bn_state, dtype=dtype,
                              normalize=normalize)
        if aot_ms:
            # whole-image multi-scale/flip: per-scale logits executables
            # (cli.deploy --ms), dispatched by the scaled input shape —
            # the reference serves its TRT engine inside
            # predict_multiscale the same way (evaluate.py:273-276)
            if meta is None or "ms" not in meta:
                raise SystemExit(
                    "whole-image ms/flip serving needs a per-scale "
                    "artifact set: export with cli.deploy --ms "
                    f"'{args.ms}' --output logits")
            missing = [s for s in scales_chk
                       if str(s) not in meta["ms"]]
            if missing:
                raise SystemExit(
                    f"scales {missing} not in the exported set "
                    f"{sorted(meta['ms'])} — re-export with "
                    f"cli.deploy --ms '{args.ms}'")
            runs_by_hw = {}
            for s in scales_chk:
                ent = meta["ms"][str(s)]
                # the (h, w) dispatch below never re-checks batch — a
                # mismatch would only surface as jax.export's opaque
                # aval error on the first image
                if ent["input"][0] != args.batch_size:
                    raise SystemExit(
                        f"per-scale executables were exported at "
                        f"batch {ent['input'][0]} but --batch-size is "
                        f"{args.batch_size} — re-export with "
                        f"cli.deploy --ms --batch-size "
                        f"{args.batch_size}")
                run_s = load_serialized(os.path.join(aot_dir,
                                                     ent["file"]))
                runs_by_hw[tuple(ent["input"][1:3])] = run_s
            predictor.use_aot_scales(runs_by_hw, aot_params)
        else:
            run = load_serialized(args.aot_path)
            if aot_fmt == "nchw":
                # one device-side transpose per image; the NCHW stem
                # path it unlocks is worth more than the copy (ROADMAP:
                # +1.4% R101, +4% HRNet-W48)
                _body = run
                run = (lambda p, img: _body(
                    p, jnp.transpose(img, (0, 3, 1, 2))))
            if aot_sliding:
                predictor.use_aot_tiles(run, aot_params)
            else:
                predictor.use_aot_whole(run, aot_params)
    else:
        mesh = None
        if args.eval_shard != "none":
            from dcfp_tpu.parallel.mesh import create_mesh
            devices = jax.devices()
            if args.num_devices > 0:
                devices = devices[:args.num_devices]
            mesh = create_mesh(n_data=len(devices) // args.spatial_shards,
                               n_spatial=args.spatial_shards,
                               devices=devices)
            log.info("eval mesh: %s over %d device(s)", args.eval_shard,
                     len(devices))
        predictor = Predictor(graph, params, bn_state, dtype=dtype,
                              bucket_quantum=args.bucket_quantum,
                              align_corner=args.align_corner,
                              mesh=mesh, shard=args.eval_shard
                              if args.eval_shard != "none" else "data",
                              normalize=normalize)

    scales = [float(s) for s in args.ms.split(",") if s]
    result_file = args.result_file or os.path.join(
        os.path.dirname(os.path.abspath(args.restore_from)), "result.txt")
    predict_dir = args.predict_dir or (
        os.path.join(os.path.dirname(os.path.abspath(args.restore_from)),
                     "predict") if args.save_predict else None)

    tag = (f"{args.restore_from} whole={args.whole} ms={args.ms} "
           f"flip={args.flip} iou={args.iou_type}")
    result = evaluate(
        predictor, loader, num_classes=dataset.num_classes,
        ignore_label=dataset.ignore_label, whole=args.whole,
        scales=scales, flip=args.flip, align_corner=args.align_corner,
        tile_size=parse_hw(args.input_size), longsize=args.longsize,
        shortsize=args.shortsize,
        iou_type="boundary" if args.iou_type == "boundary" else "mask",
        dilation_ratio=args.dilation_ratio,
        save_predict_dir=predict_dir,
        cmap=getattr(dataset, "CMAP", None),
        result_file=result_file, result_tag=tag,
        pipeline=args.pipeline)
    print(f"meanIU {result['meanIU']:.4f}  meanP {result['meanP']:.4f}  "
          f"meanR {result['meanR']:.4f}  FPS {result['fps']:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
