"""HRNet-W48 deploy cost split: backbone vs head vs final-fusion.

Round-3 profile showed 60 ms e2e with two big head ops (11.8 + 4.7 ms);
barriers changed nothing (tools/exp_hrnet.py), so this splits the graph
into independently-timed segments instead:

* full       — the deploy path (reference for the split)
* backbone   — stem..stage4 + final upsample/concat -> 720ch @ 1/4 res
* stages     — stem..stage4 only (no final upsample/concat)
* head       — random 720ch @ 1/4 res -> last_conv -> Pallas tail

backbone + head should ~= full; (backbone - stages) is the final
4-branch upsample+concat cost.

Usage: python tools/exp_hrnet2.py [iters]
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


def reroot(graph, seed):
    """Graph suffix rooted at ``seed`` (dead producers dropped)."""
    g = graph.copy()
    node = g.node(seed)
    node.op = "input"
    node.inputs = ()
    node.attrs = {}
    kept = {}
    for n in g.nodes.values():
        if n.name == seed:
            kept[n.name] = n
        elif n.inputs and all(i in kept for i in n.inputs):
            kept[n.name] = n
    g.nodes = kept
    g.inputs = [seed]
    return g


def prefix(graph, out):
    """Graph truncated to output ``out`` (dead consumers dropped)."""
    g = graph.copy()
    need = {out}
    for n in reversed(list(g.nodes.values())):
        if n.name in need:
            need.update(n.inputs)
    g.nodes = {k: v for k, v in g.nodes.items() if k in need}
    g.outputs = [out]
    return g


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    model = build_model("simple", backbone="hrnetv2w48",
                        backbone_para={"pretrained": False},
                        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    g, params, state = fold_batchnorm(model.graph, params, state)
    dev_params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), params)

    hw = (1025, 2049)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        -1, 1, (1, hw[0], hw[1], 3)).astype(np.float32))
    cat = "backbone.final_cat"
    pre_tail = g.node("pred").inputs[0]

    # stage4 branch outputs = inputs of the final upsample/concat chain
    ups_inputs = []
    for name in g.node(cat).inputs:
        n = g.node(name)
        ups_inputs.append(n.inputs[0] if n.op == "resize" else name)

    def time_fn(label, fn, *args):
        run = jax.jit(fn).lower(*jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            args)).compile()
        out = run(*args)
        for _ in range(5):
            out = run(*args)
        np.asarray(jax.tree.leaves(out)[-1].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*args)
        np.asarray(jax.tree.leaves(out)[-1].ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{label}: {ms:.2f} ms", flush=True)
        return ms

    # full
    from dcfp_tpu.ops.pallas_kernels import resize_argmax

    def full(p, img):
        gg = prefix(g, pre_tail)
        outs, _ = graph_apply(gg, p, state, {"image": img.astype(jnp.bfloat16)},
                              train=False, input_hw=hw)
        return resize_argmax(outs[pre_tail], hw, True)

    t_full = time_fn("full", full, dev_params, image)

    # backbone (includes final upsample+concat)
    g_bb = prefix(g, cat)

    def backbone(p, img):
        outs, _ = graph_apply(g_bb, p, state,
                              {"image": img.astype(jnp.bfloat16)},
                              train=False, input_hw=hw)
        return outs[cat]

    t_bb = time_fn("backbone(+cat)", backbone, dev_params, image)

    # stages only (stop at the four branch outputs)
    g_st = prefix(g, cat)
    g_st.outputs = list(ups_inputs)

    def stages(p, img):
        outs, _ = graph_apply(g_st, p, state,
                              {"image": img.astype(jnp.bfloat16)},
                              train=False, input_hw=hw)
        return [outs[o] for o in g_st.outputs]

    t_st = time_fn("stages", stages, dev_params, image)

    # head: random 720ch @ 1/4 res -> last_conv -> tail
    g_hd = reroot(g, cat)
    feat = jnp.asarray(rng.uniform(
        -1, 1, (1, (hw[0] + 3) // 4, (hw[1] + 3) // 4, 720)
        ).astype(np.float32)).astype(jnp.bfloat16)

    def head(p, f):
        gg = prefix(g_hd, pre_tail)
        outs, _ = graph_apply(gg, p, state, {cat: f}, train=False,
                              input_hw=hw)
        return resize_argmax(outs[pre_tail], hw, True)

    t_hd = time_fn("head", head, dev_params, feat)

    print(f"\nsplit: full {t_full:.1f} = backbone {t_bb:.1f} + head "
          f"{t_hd:.1f} (sum {t_bb + t_hd:.1f}); final up+cat "
          f"{t_bb - t_st:.1f}; stages {t_st:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
