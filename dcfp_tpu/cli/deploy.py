"""Deployment export entry point (reference totrt.py parity).

Builds the (optionally pruned) model, folds BatchNorm into convs,
AOT-compiles a bfloat16 forward at the fixed deploy resolution, saves the
serialized executable (the TRT-engine-file analog, totrt.py:122), and
benchmarks latency with the reference protocol (10 warmup + 50 timed,
totrt.py:70-89).

Example (matches scripts/cs/trt.sh):
  python -m dcfp_tpu.cli.deploy --dataset CS --model deeplabv3 \\
      --backbone resnet50 --backbone-para '{"os":8,"mg_unit":[1,2,4]}' \\
      --input-size 1024,2048 \\
      --restore-from snapshots/.../CS_scenes_36000.msgpack \\
      --channel-cfg snapshots/cs_prune/channel_cfg.msgpack \\
      --save-dir deploy/cs
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.cli.common import (add_model_args, build_model_from_args,
                                 maybe_load_channel_cfg, parse_hw, str2bool)
from dcfp_tpu.utils.logger import get_logger

log = get_logger()

NUM_CLASSES = {"CS": 19, "CTX": 59, "ADE": 150, "COCO": 171}


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dcfp_tpu deploy")
    add_model_args(p)
    p.add_argument("--dataset", type=str, default="CS")
    p.add_argument("--input-size", type=str, default="1025,2049",
                   help="deploy H,W (reference scripts/cs/trt.sh uses "
                        "1025,2049 for align-corner models)")
    p.add_argument("--restore-from", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--output", type=str, default="argmax",
                   help="argmax (uint8 labels) | logits")
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--deploy-form", type=str, default="auto",
                   choices=["auto", "split", "single"],
                   help="auto: compile both forms, probe, keep the "
                        "faster (the TRT builder's tactic-selection "
                        "analog); split: Pallas tail in its own "
                        "executable; single: one program")
    p.add_argument("--input-format", type=str, default="nhwc",
                   choices=["nhwc", "nchw"],
                   help="executable input layout. nchw is the reference "
                        "engine's own format (totrt.py:113) and measured "
                        "faster on TPU (stem runs as decimation matmuls; "
                        "+1.4% pruned R101, +4% HRNet-W48 — ROADMAP); "
                        "evaluate --use-aot feeds either")
    p.add_argument("--ms", type=str, default=None,
                   help="comma-joined eval scales (e.g. '0.75,1,1.25'): "
                        "export one logits executable per scale shape so "
                        "evaluate --use-aot can serve multi-scale(+flip) "
                        "whole-image eval — the reference feeds its TRT "
                        "engine to predict_multiscale the same way "
                        "(evaluate.py:273-276, :198-227).  Requires "
                        "--output logits and --input-format nhwc; "
                        "--input-size must be the PADDED eval resolution "
                        "(e.g. 1025,2049 for align-corner CS)")
    p.add_argument("--xla-options", type=str, default=None,
                   help="comma-separated XLA compiler options for the "
                        "deploy compile, e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=65536 (TRT "
                        "builder-flag analog; also via DCFP_XLA_OPTIONS "
                        "env). Names are validated by the compiler")
    return p


def _export_multiscale(args, graph, params, bn_state, hw, dtype) -> int:
    """Export one serialized logits executable per eval scale so
    ``evaluate --use-aot`` can serve multi-scale(+flip) whole-image eval —
    the reference serves its TRT engine inside predict_multiscale the
    same way (evaluate.py:273-276, :198-227).  Scale shapes follow the
    evaluator's own formula: ``int(H*s), int(W*s)`` of the padded eval
    resolution (engine/evaluator.py predict_multiscale)."""
    from dcfp_tpu.engine.deploy import (aot_compile, benchmark,
                                        export_serialized,
                                        make_split_inference_fn)
    from dcfp_tpu.utils import checkpoint as ckpt

    h, w = hw
    body_fn, tail_fn, dev_params = make_split_inference_fn(
        graph, params, bn_state, dtype=dtype, fold_bn=True,
        output="logits", input_format="nhwc")
    assert tail_fn is None  # logits output has no Pallas tail
    os.makedirs(args.save_dir, exist_ok=True)
    ms_meta = {}
    for tok in [t for t in args.ms.split(",") if t.strip()]:
        key = str(float(tok))  # evaluate normalizes scales via float()
        hs, ws = int(h * float(tok)), int(w * float(tok))
        shape = (args.batch_size, hs, ws, 3)
        fname = f"model_s{key}.stablehlo"
        export_serialized(body_fn, dev_params, shape,
                          os.path.join(args.save_dir, fname))
        ms_meta[key] = {"file": fname, "input": list(shape)}
    ckpt.save_pytree(os.path.join(args.save_dir, "deploy_params.msgpack"),
                     dev_params)
    with open(os.path.join(args.save_dir, "meta.json"), "w") as f:
        json.dump({"input": [args.batch_size, h, w, 3],
                   "dtype": args.dtype, "output": "logits",
                   "form": "split", "input_format": "nhwc",
                   "split_tail": False, "ms": ms_meta}, f)

    # true serving latency: benchmark EVERY scale executable and report
    # the per-image cost of the full protocol — sum over scales, and
    # doubled for the flip variant (evaluate's ms+flip runs each scale
    # twice, reference evaluate.py:198-227) — not just the largest scale
    per_scale = {}
    rng = np.random.default_rng(0)
    for key, m in sorted(ms_meta.items(),
                         key=lambda kv: -(kv[1]["input"][1]
                                          * kv[1]["input"][2])):
        shape = tuple(m["input"])
        compiled = aot_compile(body_fn, dev_params, shape)
        image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        stats = benchmark(lambda img: compiled(dev_params, img), image,
                          warmup=args.warmup, iters=args.iters)
        per_scale[key] = round(stats["ms_per_batch"] / args.batch_size, 3)
    ms_sum = round(sum(per_scale.values()), 3)
    print(json.dumps({"input": [args.batch_size, h, w, 3],
                      "dtype": args.dtype,
                      "form": "ms", "scales": sorted(ms_meta),
                      "ms_per_image_per_scale": per_scale,
                      "ms_per_image": ms_sum,
                      "ms_per_image_flip": round(2 * ms_sum, 3),
                      "images_per_sec": round(1000.0 / ms_sum, 3)}))
    return 0


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)
    from dcfp_tpu.data.paths import dataset_key
    from dcfp_tpu.engine.deploy import (aot_compile, aot_compile_best,
                                        aot_compile_split, benchmark,
                                        export_serialized,
                                        export_serialized_split,
                                        infer_out_hw,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.prune.pruner import apply_channel_cfg
    from dcfp_tpu.utils import checkpoint as ckpt

    if args.xla_options:
        # aot_compile* default their compiler_options from this env var
        os.environ["DCFP_XLA_OPTIONS"] = args.xla_options

    if args.ms is not None:
        # static flag validation up front — the model build below costs
        # a minute on the tunneled chip
        toks = [t for t in args.ms.split(",") if t.strip()]
        if not toks:
            raise SystemExit(f"--ms {args.ms!r} parses to zero scales — "
                             "pass comma-joined floats, e.g. "
                             "--ms '0.75,1'")
        seen = set()
        for tok in toks:
            try:
                val = float(tok)
            except ValueError:
                raise SystemExit(f"--ms {args.ms!r}: {tok.strip()!r} is "
                                 "not a float — pass comma-joined "
                                 "floats, e.g. --ms '0.75,1'") from None
            if val <= 0:
                raise SystemExit(f"--ms {args.ms!r}: scale {tok.strip()!r}"
                                 " must be > 0 (it multiplies the export "
                                 "resolution)")
            if str(val) in seen:
                raise SystemExit(f"--ms {args.ms!r}: duplicate scale "
                                 f"{tok.strip()!r} (scales normalize via "
                                 "float(); '1' and '1.0' collide)")
            seen.add(str(val))
        if args.output != "logits":
            raise SystemExit("--ms exports probability executables for "
                             "scale averaging: use --output logits")
        if args.input_format != "nhwc":
            raise SystemExit("--ms exports feed the evaluator's per-scale "
                             "resize, which is NHWC: use "
                             "--input-format nhwc")
        if not args.save_dir:
            raise SystemExit("--ms needs --save-dir (it exists to write "
                             "the serialized per-scale artifact set)")

    num_classes = NUM_CLASSES[dataset_key(args.dataset)]
    model = build_model_from_args(args, num_classes, deepsup=False)
    graph = model.graph
    cfg = maybe_load_channel_cfg(args)
    if cfg is not None:
        graph = apply_channel_cfg(graph, cfg)
    params, bn_state = init_graph(graph, jax.random.key(0))
    if args.restore_from:
        params, bn_state = ckpt.load_params_non_strict(args.restore_from,
                                                       params, bn_state)

    h, w = parse_hw(args.input_size)
    fmt = args.input_format
    shape = ((args.batch_size, 3, h, w) if fmt == "nchw"
             else (args.batch_size, h, w, 3))
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[args.dtype]

    if args.ms is not None:
        # flags validated up front, before the model build above
        return _export_multiscale(args, graph, params, bn_state,
                                  (h, w), dtype)

    # body and tail compile as separate executables by default:
    # one-program compilation can cost the conv chain XLA's tiled
    # strategy (see deploy.make_split_inference_fn; measured
    # 60.4 -> 49.3 ms on HRNet-W48 @1025x2049).  --deploy-form auto
    # probes both forms and keeps the faster (the TRT builder's
    # tactic-selection analog).
    body_fn, tail_fn, dev_params = make_split_inference_fn(
        graph, params, bn_state, dtype=dtype, fold_bn=True,
        output=args.output, input_format=fmt)
    image = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, shape).astype(np.float32))
    out_hw = infer_out_hw(shape, fmt)

    def single_fn(p, img):
        return tail_fn(body_fn(p, img), out_hw)

    if tail_fn is None or args.deploy_form == "split":
        compiled, form = (aot_compile_split(body_fn, tail_fn, dev_params,
                                            shape, input_format=fmt),
                          "split")
    elif args.deploy_form == "single":
        compiled, form = aot_compile(single_fn, dev_params,
                                     shape), "single"
    else:
        compiled, form = aot_compile_best(body_fn, tail_fn, dev_params,
                                          shape, input_format=fmt,
                                          sample=image)
    log.info("deploy form: %s", form)

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        path = os.path.join(args.save_dir, "model.stablehlo")
        if form == "single" and tail_fn is not None:
            # export_serialized removes any stale .tail itself
            export_serialized(single_fn, dev_params, shape, path)
        else:
            export_serialized_split(body_fn, tail_fn, dev_params, shape,
                                    path, input_format=fmt)
        ckpt.save_pytree(os.path.join(args.save_dir,
                                      "deploy_params.msgpack"), dev_params)
        with open(os.path.join(args.save_dir, "meta.json"), "w") as f:
            json.dump({"input": list(shape), "dtype": args.dtype,
                       "output": args.output, "form": form,
                       "input_format": fmt,
                       "split_tail": (form == "split"
                                      and tail_fn is not None)}, f)

    stats = benchmark(lambda img: compiled(dev_params, img), image,
                      warmup=args.warmup, iters=args.iters)
    print(json.dumps({"input": list(shape), "dtype": args.dtype,
                      "form": form,
                      "ms_per_batch": round(stats["ms_per_batch"], 3),
                      "images_per_sec": round(stats["images_per_sec"], 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
