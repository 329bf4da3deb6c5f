"""Measure protocol-loop vs pipelined eval FPS on the real chip.

The protocol loop (engine.evaluator.evaluate) brackets every image with
a host fetch (reference evaluate.py:327-337); over the tunneled sandbox
chip that costs ~25 ms/image of round-trip latency.  The pipelined loop
(evaluate_pipelined) keeps H2D, forward, argmax and the confusion update
on device with no per-image sync.  This script decodes two full-res
synthetic val images once and replays them N times so the comparison
isolates the dispatch discipline from host PNG decode.

Usage: python tools/exp_pipeline_eval.py [N_IMAGES] [--pruned]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    os.environ.setdefault("DCFP_CS_ROOT", "/tmp/cs_hw")
    os.environ.setdefault("DCFP_CS_VAL_LIST", "/tmp/cs_hw/val.lst")
    ds = build_dataset("CS", "val", crop_size=(769, 769))
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

    t0 = time.perf_counter()
    res_p = evaluate(pred, loader(), num_classes=19, whole=True,
                     align_corner=True, fps_warmup=5)
    t_proto = time.perf_counter() - t0
    print(f"protocol:  FPS {res_p['fps']:.2f}  wall {t_proto:.1f}s  "
          f"meanIU {res_p['meanIU']:.4f}", flush=True)

    t0 = time.perf_counter()
    res_q = evaluate_pipelined(pred, loader(), num_classes=19,
                               align_corner=True, fps_warmup=5)
    t_pipe = time.perf_counter() - t0
    print(f"pipelined: FPS {res_q['fps']:.2f}  wall {t_pipe:.1f}s  "
          f"meanIU {res_q['meanIU']:.4f}", flush=True)

    np.testing.assert_array_equal(res_p["confusion"], res_q["confusion"])
    print("confusion matrices identical", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
