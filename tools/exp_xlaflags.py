"""XLA compiler-option autotune sweep for the deploy path — the TPU
analog of TensorRT's tactic search (the reference's builder sweeps conv
tactics per layer; totrt.py:45-69 sets builder flags).

TPU-side knobs can NOT be set via client ``XLA_FLAGS`` here: the axon
remote-compile client only parses flags its local (CPU) XLA build knows,
so ``--xla_tpu_*`` is "Unknown flag" (measured).  The channel that works
is PJRT per-compile options (``lowered.compile({...})``), which serialize
into the compile request and are validated server-side — threaded through
``deploy.aot_compile(compiler_options=...)`` / env ``DCFP_XLA_OPTIONS``.

Usage:
    python tools/exp_xlaflags.py                 # built-in candidate sweep
    python tools/exp_xlaflags.py flag=v [f=v,f=v ...]   # explicit variants
Each positional arg is ONE variant (comma-separate to combine options).
The model/protocol is bench.py's pruned headline (R101 @~47% FLOPs,
1025x2049 bf16 NCHW, 10 warmup + 50 timed) in the split deploy form
(the autotuned winner at this config; fixed so variants compare one
program).  The persistent compile cache is disabled: a cache hit keyed
without the option overrides would silently time the wrong build.
DCFP_EXP_MODEL / DCFP_EXP_BACKBONE switch the model (hrnet* backbones
run unpruned, matching the ROADMAP headline).
"""

import os
import sys

os.environ["DCFP_COMPILE_CACHE"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from _common import clear_env_compiler_options, default_backbone_para  # noqa: E402
from dcfp_tpu.engine.deploy import parse_compiler_options  # noqa: E402

CANDIDATES = [
    "xla_tpu_scoped_vmem_limit_kib=32768",
    "xla_tpu_scoped_vmem_limit_kib=65536",
    "xla_tpu_enable_latency_hiding_scheduler=false",
    "xla_tpu_rwb_fusion=false",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "xla_tpu_dot_dot_fusion=false",
    "xla_tpu_enable_experimental_fusion_cost_model=true",
    "xla_tpu_prefer_latch_optimized_rhs_layouts=true",
]


def main(variants):
    clear_env_compiler_options()
    from dcfp_tpu.engine.deploy import (aot_compile_split, benchmark,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    shape, warmup, iters = (1, 1025, 2049, 3), 10, 50
    head = os.environ.get("DCFP_EXP_MODEL", "deeplabv3")
    backbone = os.environ.get("DCFP_EXP_BACKBONE", "resnet101")
    hrnet = backbone.startswith("hrnet")
    bpara = default_backbone_para(backbone)
    model = build_model(
        head, backbone=backbone, backbone_para=bpara,
        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))
    rng = np.random.default_rng(0)
    if hrnet:
        # the HRNet deploy headline is unpruned (ROADMAP)
        import types
        result = types.SimpleNamespace(graph=model.graph, params=params,
                                       state=state)
    else:
        eic = {bn: np.abs(rng.standard_normal(
            model.graph.node(bn).attrs["channels"])).astype(np.float32)
            for bn in prunable_bn_names(model.graph)}
        result, gp, report = prune_to_flops(
            model.graph, model.graph, params, state, eic, prune_ratio=0.5,
            layer_keep=0.02, except_start_keys=(), channel_align=128)
        print(f"pruned: gp={gp} flops_ratio={report['flops_ratio']:.4f}",
              flush=True)

    nchw = (shape[0], shape[3], shape[1], shape[2])
    image = jnp.asarray(rng.uniform(-1, 1, nchw).astype(np.float32))
    body_fn, tail_fn, dev_params = make_split_inference_fn(
        result.graph, result.params, result.state, dtype=jnp.bfloat16,
        fold_bn=True, output="argmax", input_format="nchw")

    ref = None
    for variant in [""] + list(variants):
        label = variant or "(baseline)"
        try:
            opts = (parse_compiler_options(variant, source="variant")
                    if variant else {})
            compiled = aot_compile_split(
                body_fn, tail_fn, dev_params, nchw, input_format="nchw",
                compiler_options=opts)
            stats = benchmark(lambda img: compiled(dev_params, img),
                              image, warmup=warmup, iters=iters)
        except Exception as e:
            print(f"XLAOPT {label}: FAILED {str(e)[:160]}", flush=True)
            continue
        lab = np.asarray(compiled(dev_params, image))
        agree = 1.0 if ref is None else float((lab == ref).mean())
        if ref is None:
            ref = lab
        print(f"XLAOPT {label}: {stats['ms_per_batch']:.2f} ms "
              f"({stats['images_per_sec']:.2f} img/s) agree={agree:.4f}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or CANDIDATES)
