"""Per-op XProf trace of the HRNet-W48 *head only* (720ch @ 1/4 res ->
last_conv -> Pallas tail): 18.4 ms of the 60 ms e2e (tools/exp_hrnet2.py)
for ~600 GFLOP — 16% MFU.  Where does it go?

MEASURED RESULT: the two 3x3 head convs run in an 11.8 ms fusion with
pathological {3,0,2,1:T(2,128)} layouts + a 4.7 ms classifier; without
the Pallas tail the same convs take 7.1 ms using XLA's spatially-tiled
conv strategy ([257,1,8,65,256] shapes).  Follow-ups measured: an
optimization_barrier before the tail does NOT restore the strategy;
neither does emitting channel-major logits natively (dot_general or a
Pallas classifier kernel — the operand constraint propagates into the
conv chain either way, still ~18 ms).  Only a separate tail executable
recovers it: tools/exp_hrnet_split.py (60.4 -> 49.3 ms e2e).

Usage: python tools/exp_hrnet3.py [top_n]
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

from dcfp_tpu.engine.deploy import fold_batchnorm
from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.ops.pallas_kernels import resize_argmax
from exp_hrnet2 import prefix, reroot
from exp_xprof import collect


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    trace_dir = os.environ.get("DCFP_TRACE_DIR", "/tmp/dcfp_xprof_hd")
    model = build_model("simple", backbone="hrnetv2w48",
                        backbone_para={"pretrained": False},
                        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    g, params, state = fold_batchnorm(model.graph, params, state)
    dev_params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), params)
    hw = (1025, 2049)
    cat = "backbone.final_cat"
    pre_tail = g.node("pred").inputs[0]
    g_hd = prefix(reroot(g, cat), pre_tail)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.uniform(
        -1, 1, (1, 257, 513, 720)).astype(np.float32)).astype(jnp.bfloat16)

    def head(p, f):
        outs, _ = graph_apply(g_hd, p, state, {cat: f}, train=False,
                              input_hw=hw)
        return resize_argmax(outs[pre_tail], hw, True)

    def head_logits(p, f):
        # no Pallas tail, no transpose: does the conv fusion speed up
        # once nothing downstream forces a channels-minor layout?
        outs, _ = graph_apply(g_hd, p, state, {cat: f}, train=False,
                              input_hw=hw)
        return outs[pre_tail]

    specs = (jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dev_params),
        jax.ShapeDtypeStruct(feat.shape, feat.dtype))
    import time as _t
    runl = jax.jit(head_logits).lower(*specs).compile()
    for _ in range(3):
        outl = runl(dev_params, feat)
    np.asarray(outl.ravel()[0])
    t0 = _t.perf_counter()
    for _ in range(20):
        outl = runl(dev_params, feat)
    np.asarray(outl.ravel()[0])
    print(f"head WITHOUT tail (NHWC logits out): "
          f"{(_t.perf_counter() - t0) / 20 * 1000:.2f} ms", flush=True)

    run = jax.jit(head).lower(*specs).compile()
    for _ in range(3):
        out = run(dev_params, feat)
    np.asarray(out.ravel()[0])

    n_prof = 3
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(n_prof):
        out = run(dev_params, feat)
    np.asarray(out.ravel()[0])
    wall = (time.perf_counter() - t0) / n_prof * 1000
    jax.profiler.stop_trace()
    print(f"head wall {wall:.1f} ms", flush=True)

    agg, _ = collect(trace_dir, top_n)
    total = sum(v[0] for v in agg.values())
    print(f"total device op time {total / n_prof:.1f} ms across "
          f"{len(agg)} ops")
    for name, (dur, cnt) in sorted(agg.items(),
                                   key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{dur / n_prof:9.3f} ms  x{cnt:<4d} {name[:120]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
