"""Cumulative prefix profile of the pruned deploy graph: AOT-compile the
graph truncated after each backbone stage and time it, so per-segment
cost = difference of adjacent prefixes.  (XProf is unavailable over the
tunnel; prefix timing needs only the host-fetch sync that works here.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CUTS = [
    ("stem", "backbone.maxpool"),
    ("layer1", "backbone.layer1.2.out"),
    ("layer2", "backbone.layer2.3.out"),
    ("layer3", "backbone.layer3.22.out"),
    ("layer4", "backbone.layer4.2.out"),
    ("aspp", "aspp.relu"),
    ("classifier", "last_conv.6"),
]

STEM_CUTS = [
    ("conv1(3->64,s2)", "backbone.conv1.0"),
    ("relu0", "backbone.conv1.relu0"),
    ("conv2(64->64)", "backbone.conv1.3"),
    ("relu1", "backbone.conv1.relu1"),
    ("conv3(64->128)", "backbone.conv1.6"),
    ("relu2", "backbone.relu1"),
    ("maxpool", "backbone.maxpool"),
]


def main():
    from dcfp_tpu.engine.deploy import fold_batchnorm
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    shape = (1, 1025, 2049, 3)
    model = build_model(
        "deeplabv3", backbone="resnet101",
        backbone_para={"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128},
        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    rng = np.random.default_rng(0)
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

    names = set(n.name for n in graph.toposorted())
    cuts = STEM_CUTS if "--stem" in sys.argv else CUTS + [("full", None)]
    prev_ms, prev_label = 0.0, "input"
    for label, cut in cuts:
        g = graph.copy()
        if cut is not None:
            if cut not in names:
                print(f"({label}: node {cut} not in graph, skipped)")
                continue
            g.outputs = [cut]

        def fn(p, image, g=g):
            outs, _ = graph_apply(g, p, s, {"image": image.astype(
                jnp.bfloat16)}, train=False)
            return jax.tree.map(lambda t: t.astype(jnp.bfloat16), outs)

        spec = jax.ShapeDtypeStruct(shape, jnp.float32)
        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dev_p)
        compiled = jax.jit(fn).lower(pspec, spec).compile()
        for _ in range(3):
            out = compiled(dev_p, image)
        np.asarray(jax.tree.leaves(out)[-1].ravel()[0])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(dev_p, image)
        np.asarray(jax.tree.leaves(out)[-1].ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{label:11s} cumulative {ms:7.2f} ms  (+{ms - prev_ms:6.2f} "
              f"since {prev_label})", flush=True)
        prev_ms, prev_label = ms, label
    print(f"pruned gp={gp} flops_ratio={report['flops_ratio']:.4f}")


if __name__ == "__main__":
    main()
