"""HRNetV2-W48 deploy optimization experiments (round 3).

Per-op profiling (tools/exp_xprof.py variant 'hrnet') showed the head
dominating the 75 ms step: the 3x3 720->256 conv at 1/4 res costs
11.8 ms (19% MFU — XLA fuses the 4-branch upsample+concat producer into
the conv and re-evaluates it per output tile) and the 256->19
classifier costs 4.7 ms.  Variants measured here:

* base      — current deploy path
* barrier   — optimization_barrier after backbone.final_cat
              (materialize the 720-ch concat once)
* barrier2  — barrier after final_cat AND after last_conv relu
              (materialize the classifier's 256-ch input too)

Each variant is argmax-checked against base.

MEASURED RESULT: all variants identical (base 60.1 ms; barriers are
e2e neutral) — the head slowness is NOT producer refusion; it is the
Pallas tail forcing XLA off its tiled conv strategy for the whole
in-program conv chain.  See tools/exp_hrnet_split.py for the fix.

Usage: python tools/exp_hrnet.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get("DCFP_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/dcfp_tpu_xla"))
if _cache and _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.engine.deploy import (aot_compile, benchmark,
                                    insert_barriers, make_inference_fn)
from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.models.registry import build_model


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    model = build_model("simple", backbone="hrnetv2w48",
                        backbone_para={"pretrained": False},
                        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    shape = (1, 1025, 2049, 3)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

    relu_before_cls = None
    for node in model.graph.toposorted():
        if node.op == "relu" and node.name.startswith("last_conv"):
            relu_before_cls = node.name
    variants = {
        "base": model.graph,
        "barrier": insert_barriers(model.graph, ["backbone.final_cat"]),
    }
    if relu_before_cls:
        variants["barrier2"] = insert_barriers(
            model.graph, ["backbone.final_cat", relu_before_cls])

    ref_out = None
    for name, g in variants.items():
        fn, dev_params = make_inference_fn(g, params, state,
                                           dtype=jnp.bfloat16,
                                           fold_bn=True, output="argmax")
        t0 = time.time()
        run = aot_compile(fn, dev_params, shape)
        print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)
        out = np.asarray(run(dev_params, image))
        if ref_out is None:
            ref_out = out
        else:
            agree = float((out == ref_out).mean())
            print(f"{name}: argmax agreement vs base {agree:.4f}",
                  flush=True)
        r = benchmark(lambda img: run(dev_params, img), image,
                      warmup=5, iters=iters)
        print(f"{name}: {r['ms_per_batch']:.2f} ms/image  "
              f"({r['images_per_sec']:.1f} img/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
