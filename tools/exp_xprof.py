"""Per-op train-step attribution from an on-disk XProf trace.

Captures a device trace of the jitted Cityscapes-recipe train step
(fwd + GSRL + bwd + EIC + SGD) with jax.profiler and aggregates per-op
device time from the saved .xplane.pb via jax.profiler.ProfileData — no
XProf UI needed (the round-2 blocker: the UI is unreachable over the
tunnel; the trace file is not).

Usage:
  python tools/exp_xprof.py [batch] [top_n] [variant]
Variant: train (default) | fwd | deploy | deploy_pruned | hrnet
Output: top ops by total device time, grouped by fusion name prefix.
"""

import glob
import os
import re
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


def sync(x):
    return np.asarray(jax.tree.leaves(x)[-1].ravel()[0])


def build_step(variant, batch):
    from dcfp_tpu.engine.optim import build_optimizer
    from dcfp_tpu.engine.trainer import create_train_state, make_train_step
    from dcfp_tpu.losses.criteria import build_criterions
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.models.registry import build_model

    hw = int(os.environ.get("DCFP_EXP_HW", "769"))
    rng = np.random.default_rng(0)
    head = os.environ.get("DCFP_EXP_MODEL", "deeplabv3")
    backbone = os.environ.get("DCFP_EXP_BACKBONE", "resnet50")
    bpara = default_backbone_para(backbone)
    model = build_model(
        head, backbone=backbone, backbone_para=bpara,
        num_classes=19, align_corner=True, deepsup=True)
    params, bn = init_graph(model.graph, jax.random.key(0))
    b = {
        "img": jnp.asarray(rng.standard_normal(
            (batch, hw, hw, 3)).astype(np.float32)),
        "label": {
            "ori": jnp.asarray(rng.integers(
                0, 19, (batch, hw, hw)).astype(np.int32)),
            "weight": jnp.asarray(rng.uniform(
                0.5, 2.0, (batch, hw, hw)).astype(np.float32)),
        },
    }
    crit = build_criterions("gsrl", ignore_label=255)
    if variant == "fwd":
        @jax.jit
        def fwd(params, bn, b, key):
            img = b["img"].astype(jnp.bfloat16)
            preds, _ = graph_apply(model.graph, params, bn,
                                   {"image": img}, train=True, rng=key)
            return crit(preds, b["label"])["loss"]

        key = jax.random.key(1)
        return lambda s: (s, fwd(params, bn, b, key)), None
    if variant in ("deploy", "deploy_pruned", "hrnet"):
        from dcfp_tpu.engine.deploy import aot_compile, make_inference_fn
        if variant == "hrnet":
            dmodel = build_model(
                "simple", backbone="hrnetv2w48",
                backbone_para={"pretrained": False},
                num_classes=19, align_corner=True, deepsup=False)
        else:
            dmodel = build_model(
                "deeplabv3", backbone="resnet101",
                backbone_para={"os": 8, "mg_unit": [1, 2, 4],
                               "inplanes": 128},
                num_classes=19, align_corner=True, deepsup=False)
        dparams, dbn = init_graph(dmodel.graph, jax.random.key(0))
        if variant == "deploy_pruned":
            # the bench.py headline model: synthetic-EIC prune to ~47%
            # FLOPs with channel_align=128 (same recipe as bench.py)
            from dcfp_tpu.prune.eic import prunable_bn_names
            from dcfp_tpu.prune.search import prune_to_flops
            g = dmodel.graph
            prng = np.random.default_rng(7)
            eic = {bn: np.abs(prng.standard_normal(
                g.node(bn).attrs["channels"])).astype(np.float32)
                for bn in prunable_bn_names(g)}
            result, _, report = prune_to_flops(
                g, g, jax.tree.map(np.asarray, dparams),
                jax.tree.map(np.asarray, dbn), eic, prune_ratio=0.5,
                layer_keep=0.02, except_start_keys=(),
                channel_align=128)
            print(f"pruned to flops_ratio={report['flops_ratio']:.3f}")
            import dataclasses
            dmodel = dataclasses.replace(dmodel, graph=result.graph)
            dparams, dbn = result.params, result.state
        ifmt = "nchw" if variant.startswith("deploy") else "nhwc"
        fn, dev_params = make_inference_fn(dmodel.graph, dparams, dbn,
                                           dtype=jnp.bfloat16,
                                           fold_bn=True, output="argmax",
                                           input_format=ifmt)
        shape = ((1, 3, 1025, 2049) if ifmt == "nchw"
                 else (1, 1025, 2049, 3))
        compiled = aot_compile(fn, dev_params, shape)
        image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        return lambda s: (s, compiled(dev_params, image)), None
    tx = build_optimizer(optim="sgd", learning_rate=0.01, momentum=0.9,
                         weight_decay=5e-4, num_steps=1000, warmup=0)
    state = create_train_state(model, params, bn, tx, prune_type="dcfp")
    step = make_train_step(model, crit, tx, compute_dtype=jnp.bfloat16)
    key = jax.random.key(1)
    return lambda s: step(s, b, key), state


def collect(trace_dir, top_n):
    """Aggregate per-op device time from the newest xplane.pb."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert paths, f"no xplane.pb under {trace_dir}"
    data = jax.profiler.ProfileData.from_file(paths[-1])
    agg = {}
    plane_names = []
    for plane in data.planes:
        plane_names.append(plane.name)
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                dur = (ev.duration_ns or 0) / 1e6
                name = ev.name
                entry = agg.setdefault(name, [0.0, 0])
                entry[0] += dur
                entry[1] += 1
    return agg, plane_names


GROUP_RULES = [
    ("conv", re.compile(r"convolution|conv_general|%conv")),
    ("fusion", re.compile(r"^fusion|^loop_fusion|^input_fusion")),
    ("matmul", re.compile(r"dot|matmul")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast")),
    ("reduce", re.compile(r"reduce|all-reduce")),
]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    variant = sys.argv[3] if len(sys.argv) > 3 else "train"
    trace_dir = os.environ.get("DCFP_TRACE_DIR", "/tmp/dcfp_xprof")

    run, state = build_step(variant, batch)
    t0 = time.time()
    state, out = run(state)
    sync(out)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    for _ in range(2):
        state, out = run(state)
    sync(out)

    n_prof = 3
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(n_prof):
        state, out = run(state)
    sync(out)
    wall = (time.perf_counter() - t0) / n_prof * 1000
    jax.profiler.stop_trace()
    print(f"profiled {n_prof} steps, wall {wall:.1f} ms/step", flush=True)

    agg, planes = collect(trace_dir, top_n)
    if not agg:
        print(f"no device ops found; planes = {planes}")
        return 1
    total = sum(v[0] for v in agg.values())
    print(f"total device op time: {total / n_prof:.1f} ms/step "
          f"across {len(agg)} distinct ops")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
    for name, (dur, cnt) in rows:
        print(f"{dur / n_prof:9.3f} ms  x{cnt:<4d} {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
