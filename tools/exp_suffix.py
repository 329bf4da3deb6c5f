"""Suffix profile of the pruned deploy graph: reroot the graph at
successive interior seeds (seed tensor precomputed once, fed as the
input), AOT-compile each suffix WITH the full downstream graph intact,
and time it.  Per-segment cost = difference of adjacent suffixes.

Why not prefix profiling (tools/exp_profile.py): XLA compiles an op
differently in isolation than in full-graph context — the truncated
prefix ending at the stem conv measured 3.96 ms while the same conv's
true in-graph cost (suffix diff, verified e2e) is 0.79 ms.  Suffix
diffs keep every candidate optimization's real downstream context.

Usage: python tools/exp_suffix.py [iters]
Env: DCFP_EXP_MODEL / DCFP_EXP_BACKBONE (default deeplabv3 / resnet101,
pruned @~47% FLOPs; hrnet* profiles the unpruned ROADMAP headline with
multi-node stage frontiers — see HRNET_SEEDS).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache (same default as the CLIs): repeat experiment
# runs at the same shapes skip the minutes-long XLA compile
_cache = os.environ.get("DCFP_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/dcfp_tpu_xla"))
if _cache and _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np

from _common import default_backbone_para

SEEDS = [
    ("full", None),
    ("conv1", ["backbone.conv1.0"]),
    ("stem-out", ["backbone.maxpool"]),
    ("layer1", ["backbone.layer1.2.out"]),
    ("layer2", ["backbone.layer2.3.out"]),
    ("layer3", ["backbone.layer3.22.out"]),
    ("layer4", ["backbone.layer4.2.out"]),
    ("aspp", ["aspp.relu"]),
    ("classifier", ["last_conv.6"]),
]

# HRNet is multi-branch: a cut is a FRONTIER of per-branch nodes (all
# branch outputs of a stage), not a single node.
HRNET_SEEDS = [
    ("full", None),
    ("stem", ["backbone.relu2"]),
    ("layer1", ["backbone.layer1.3.out"]),
    ("stage2", ["backbone.stage2.0.fuse.0.out",
                "backbone.stage2.0.fuse.1.out"]),
    ("stage3", ["backbone.stage3.3.fuse.0.out",
                "backbone.stage3.3.fuse.1.out",
                "backbone.stage3.3.fuse.2.out"]),
    ("stage4", ["backbone.stage4.2.fuse.0.out",
                "backbone.stage4.2.fuse.1.out",
                "backbone.stage4.2.fuse.2.out",
                "backbone.stage4.2.fuse.3.out"]),
    ("final_cat", ["backbone.final_cat"]),
    ("classifier", ["last_conv.6"]),
]


def reroot(graph, seeds):
    """Copy of graph with the ``seeds`` frontier as its inputs and every
    node not backward-reachable from the outputs removed.  Every path
    from the original inputs to the outputs must cross the frontier,
    else the pruned graph still references the removed prefix."""
    g = graph.copy()
    for seed in seeds:
        node = g.node(seed)
        node.op = "input"
        node.inputs = ()
        node.attrs = {}
    live, stack = set(seeds), list(g.outputs)
    while stack:
        n = stack.pop()
        if n in live:
            continue
        live.add(n)
        stack.extend(g.node(n).inputs)
    g.nodes = {k: v for k, v in g.nodes.items() if k in live}
    g.inputs = list(seeds)
    return g


def main():
    from dcfp_tpu.engine.deploy import fold_batchnorm
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    shape = (1, 1025, 2049, 3)
    head = os.environ.get("DCFP_EXP_MODEL", "deeplabv3")
    backbone = os.environ.get("DCFP_EXP_BACKBONE", "resnet101")
    hrnet = backbone.startswith("hrnet")
    bpara = default_backbone_para(backbone)
    seeds_table = HRNET_SEEDS if hrnet else SEEDS
    model = build_model(
        head, backbone=backbone, backbone_para=bpara,
        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    rng = np.random.default_rng(0)
    if hrnet:
        # the HRNet deploy headline is unpruned (ROADMAP): profile that
        import types
        result = types.SimpleNamespace(graph=model.graph, params=params,
                                       state=state)
        gp, report = 1.0, {"flops_ratio": 1.0}
    else:
        eic = {bn: np.abs(rng.standard_normal(
            model.graph.node(bn).attrs["channels"])).astype(np.float32)
            for bn in prunable_bn_names(model.graph)}
        result, gp, report = prune_to_flops(
            model.graph, model.graph, params, state, eic, prune_ratio=0.5,
            layer_keep=0.02, except_start_keys=(), channel_align=128)
    graph, p, s = fold_batchnorm(result.graph, result.params, result.state)
    dev_p = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), p)
    image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

    # all seed tensors in one jitted pass
    names = set(n.name for n in graph.toposorted())
    seed_names = [c for _, cut in seeds_table if cut is not None
                  for c in cut if c in names]
    gall = graph.copy()
    gall.outputs = seed_names

    @jax.jit
    def seeds_fn(p, image):
        outs, _ = graph_apply(gall, p, s,
                              {"image": image.astype(jnp.bfloat16)},
                              train=False)
        return outs
    seed_vals = seeds_fn(dev_p, image)

    rows = []
    for label, cut in seeds_table:
        if cut is not None and any(c not in names for c in cut):
            print(f"({label}: nodes {cut} not all in graph, skipped)")
            continue
        if cut is None:
            g, feeds = graph, {"image": image}

            def fn(p, xs, g=g):  # full graph takes the f32 image
                outs, _ = graph_apply(
                    g, p, s, {"image": xs["image"].astype(jnp.bfloat16)},
                    train=False)
                return jnp.argmax(outs["pred"], -1).astype(jnp.uint8)
        else:
            g = reroot(graph, cut)
            feeds = {c: seed_vals[c] for c in cut}

            def fn(p, xs, g=g):
                outs, _ = graph_apply(g, p, s, xs, train=False,
                                      input_hw=(shape[1], shape[2]))
                return jnp.argmax(outs["pred"], -1).astype(jnp.uint8)

        xspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), feeds)
        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dev_p)
        compiled = jax.jit(fn).lower(pspec, xspec).compile()
        for _ in range(5):
            out = compiled(dev_p, feeds)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(dev_p, feeds)
        np.asarray(out.ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1000
        rows.append((label, ms))
        print(f"suffix after {label:11s}: {ms:7.2f} ms", flush=True)

    print()
    for (l0, m0), (l1, m1) in zip(rows, rows[1:]):
        print(f"segment {l0:11s} -> {l1:11s}: {m0 - m1:6.2f} ms")
    print(f"\npruned gp={gp} flops_ratio={report['flops_ratio']:.4f}")


if __name__ == "__main__":
    main()
