"""Measure protocol-loop vs pipelined eval FPS on the real chip.

The protocol loop (engine.evaluator.evaluate) brackets every image with
a host fetch (reference evaluate.py:327-337); over the tunneled sandbox
chip that costs ~25 ms/image of round-trip latency.  The pipelined loop
(evaluate_pipelined) keeps H2D, forward, argmax and the confusion update
on device with no per-image sync.  This script decodes two full-res
synthetic val images once and replays them N times so the comparison
isolates the dispatch discipline from host PNG decode.

Usage: python tools/exp_pipeline_eval.py [N_IMAGES] [--compact]
       [--ms] [--sliding] [--aot DIR]

--aot DIR serves every loop through the serialized artifact set in DIR
(cli.deploy --ms exports for whole-image ms/flip; a tile logits export
for sliding) — the protocol/pipelined/AOT-served comparison.  The
export must come from this tool's own key(0)-init weights (e.g.
cli.deploy --restore-from a checkpoint saved from that init).

--ms / --sliding run the protocol-vs-pipelined comparison for the
multi-scale(0.75,1)+flip and sliding-window(769² tiles) modes instead
of whole-image ss — the expensive protocols where removing the
per-image sync pays the most (round-3 VERDICT item 7).

--compact additionally measures raw-uint8 items (device-side
normalize): the classic f32 item is 24 MB image + 8 MB int32 label per
1024x2048 frame — over a ~45 MB/s tunnel that is ~0.7 s/image of pure
transfer; compact is 6 + 2 MB.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dcfp_tpu.data.datasets import build_dataset
from dcfp_tpu.engine.evaluator import (Predictor, evaluate,
                                       evaluate_pipelined)
from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.models.registry import build_model


def main() -> int:
    # N_IMAGES is optional and flags may come first ("--ms" alone is
    # legal per the usage line) — only consume argv[1] if it is numeric
    n = 30
    if len(sys.argv) > 1 and not sys.argv[1].startswith("-"):
        if not sys.argv[1].isdigit():
            raise SystemExit(f"usage: {sys.argv[0]} [N_IMAGES] [--ms] "
                             f"[--sliding] — got {sys.argv[1]!r}")
        n = int(sys.argv[1])
    root = os.environ.get("DCFP_CS_ROOT", "/tmp/cs_hw")
    val_list = os.environ.get("DCFP_CS_VAL_LIST",
                              os.path.join(root, "val.lst"))
    ds = build_dataset("CS", root, val_list, split="val")
    items = [ds[i] for i in range(min(2, len(ds)))]
    print(f"decoded {len(items)} val images "
          f"{items[0]['img'].shape}", flush=True)

    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para={"os": 8, "mg_unit": [1, 2, 4],
                                       "inplanes": 128},
                        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    pred = Predictor(model.graph, params, state, dtype=jnp.bfloat16,
                     align_corner=True)

    def loader():
        for i in range(n):
            it = items[i % len(items)]
            yield {"img": it["img"][None], "label": it["label"][None],
                   "img_meta": [it["img_meta"]]}

    whole = "--sliding" not in sys.argv
    scales = (0.75, 1.0) if "--ms" in sys.argv else (1.0,)
    flip = "--ms" in sys.argv
    mode = dict(whole=whole, scales=scales, flip=flip,
                tile_size=(769, 769))
    print(f"mode: {mode}", flush=True)

    apply_aot = None
    if "--aot" in sys.argv:
        # Serve the same loop through a serialized artifact set from
        # cli.deploy (--ms exports for whole-image ms/flip, a tile
        # logits export for sliding) — the third column the round-4
        # VERDICT asks for: protocol vs pipelined vs AOT-served.
        # NOTE: exports must come from the same key(0) init this tool
        # uses (BN-folded, so logits differ from the jit path only by
        # fold reassociation; confusion comparisons here are aot-vs-aot).
        import json

        from dcfp_tpu.engine.deploy import load_serialized
        from dcfp_tpu.utils import checkpoint as ckpt

        aot_dir = sys.argv[sys.argv.index("--aot") + 1]
        with open(os.path.join(aot_dir, "meta.json")) as f:
            meta = json.load(f)
        aot_params = jax.tree.map(jnp.asarray, ckpt.load_pytree(
            os.path.join(aot_dir, "deploy_params.msgpack")))
        if whole:
            runs_by_hw = {}
            for ent in meta["ms"].values():
                run_s = load_serialized(os.path.join(aot_dir,
                                                     ent["file"]))
                runs_by_hw[tuple(ent["input"][1:3])] = run_s

            def apply_aot(p):
                p.use_aot_scales(runs_by_hw, aot_params)
        else:
            tile_run = load_serialized(os.path.join(aot_dir,
                                                    "model.stablehlo"))

            def apply_aot(p):
                p.use_aot_tiles(tile_run, aot_params)
        apply_aot(pred)
        print(f"serving through {aot_dir}", flush=True)

    t0 = time.perf_counter()
    res_p = evaluate(pred, loader(), num_classes=19,
                     align_corner=True, fps_warmup=5, **mode)
    t_proto = time.perf_counter() - t0
    print(f"protocol:  FPS {res_p['fps']:.2f}  wall {t_proto:.1f}s  "
          f"meanIU {res_p['meanIU']:.4f}", flush=True)

    t0 = time.perf_counter()
    res_q = evaluate_pipelined(pred, loader(), num_classes=19,
                               align_corner=True, fps_warmup=5, **mode)
    t_pipe = time.perf_counter() - t0
    print(f"pipelined: FPS {res_q['fps']:.2f}  wall {t_pipe:.1f}s  "
          f"meanIU {res_q['meanIU']:.4f}", flush=True)

    np.testing.assert_array_equal(res_p["confusion"], res_q["confusion"])
    print("confusion matrices identical", flush=True)

    if "--compact" in sys.argv:
        dsc = build_dataset("CS", root, val_list, split="val",
                            compact=True)
        items_c = [dsc[i] for i in range(min(2, len(dsc)))]
        predc = Predictor(model.graph, params, state,
                          dtype=jnp.bfloat16, align_corner=True,
                          normalize=(dsc.mean, dsc.std))
        if apply_aot is not None:
            # prep_raw normalizes BEFORE _fwd, so the aot hooks compose
            # with compact items unchanged
            apply_aot(predc)

        def loader_c():
            for i in range(n):
                it = items_c[i % len(items_c)]
                yield {"img": it["img"][None],
                       "label": it["label"][None],
                       "img_meta": [it["img_meta"]]}

        t0 = time.perf_counter()
        res_c = evaluate_pipelined(predc, loader_c(), num_classes=19,
                                   align_corner=True, fps_warmup=5,
                                   **mode)
        t_c = time.perf_counter() - t0
        print(f"pipelined+compact: FPS {res_c['fps']:.2f}  "
              f"wall {t_c:.1f}s  meanIU {res_c['meanIU']:.4f}",
              flush=True)
        np.testing.assert_array_equal(res_p["confusion"],
                                      res_c["confusion"])
        print("compact confusion identical", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
