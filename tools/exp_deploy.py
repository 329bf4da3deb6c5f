"""Deploy-optimization experiment harness: measures throughput of the
pruned R101 deploy model (the bench.py config) under candidate graph
transforms, one AOT compile + 50-iter benchmark per variant.

Usage: python tools/exp_deploy.py [variant ...]
Variants: base, pad128, dil12, pad128+dil12, nchw, phases, int8, csplit
(split_concat_projection: ASPP concat->1x1 as summed per-branch matmuls;
combinable, e.g. csplit+dil12).  Default: base nchw phases int8.
"""

import os
import re
import sys

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


def main(variants):
    import dcfp_tpu.graph.apply as apply_mod
    from dcfp_tpu.engine.deploy import aot_compile, benchmark, \
        make_inference_fn
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    shape, warmup, iters = (1, 1025, 2049, 3), 10, 50
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
    image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    print(f"pruned: gp={gp} flops_ratio={report['flops_ratio']:.4f}",
          flush=True)

    default_min = apply_mod.DILATED_MATMUL_MIN
    ref_labels = None
    for v in variants:
        if v == "int8":
            from dcfp_tpu.engine.quantize import (argmax_agreement,
                                                  make_int8_inference_fn)
            calib = [rng.uniform(-1, 1, shape).astype(np.float32)
                     for _ in range(2)]
            fn, bundle = make_int8_inference_fn(
                result.graph, result.params, result.state,
                calib_batches=calib, output="argmax",
                compute_dtype=jnp.bfloat16)
            compiled = aot_compile(fn, bundle, shape)
            stats = benchmark(lambda img: compiled(bundle, img),
                              image, warmup=warmup, iters=iters)
            if ref_labels is not None:
                agree = argmax_agreement(
                    np.asarray(compiled(bundle, image)), ref_labels)
                print(f"int8 argmax agreement vs bf16: {agree:.4f}",
                      flush=True)
        elif v == "nchw":
            img_c = jnp.asarray(np.transpose(np.asarray(image), (0, 3, 1, 2)))
            fn, dev_params = make_inference_fn(
                result.graph, result.params, result.state,
                dtype=jnp.bfloat16, fold_bn=True, output="argmax",
                input_format="nchw")
            compiled = aot_compile(fn, dev_params, img_c.shape)
            stats = benchmark(lambda img: compiled(dev_params, img),
                              img_c, warmup=warmup, iters=iters)
            if ref_labels is not None:
                agree = (np.asarray(compiled(dev_params, img_c))
                         == ref_labels).mean()
                print(f"nchw argmax agreement vs base: {agree:.6f}",
                      flush=True)
        elif v == "headless":
            # true in-graph stem cost = base ms - headless ms: same graph
            # rerooted at the stem conv's output, which is precomputed
            # once and fed directly (everything AOT-compiled, like base).
            from dcfp_tpu.engine.deploy import _reroot_at, fold_batchnorm
            from dcfp_tpu.graph.apply import graph_apply
            from dcfp_tpu.ops.stem import stem_plan
            fg, fp, fs = fold_batchnorm(result.graph, result.params,
                                        result.state)
            input_name, stem_conv = stem_plan(fg)
            sub = _reroot_at(fg, stem_conv, input_name)
            dev_params = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), fp)
            outs, _ = graph_apply(
                fg, dev_params, fs,
                {"image": image.astype(jnp.bfloat16)}, train=False)
            y1 = outs[stem_conv] if stem_conv in outs else None
            if y1 is None:  # stem conv is interior; re-run with it as output
                fg2 = fg.copy()
                fg2.outputs = [stem_conv]
                outs, _ = graph_apply(
                    fg2, dev_params, fs,
                    {"image": image.astype(jnp.bfloat16)}, train=False)
                y1 = outs[stem_conv]

            def fn(p, seed):
                o, _ = graph_apply(sub, p, fs, {stem_conv: seed},
                                   train=False,
                                   input_hw=(shape[1], shape[2]))
                return jnp.argmax(o["pred"], -1).astype(jnp.uint8)

            compiled = aot_compile(fn, dev_params, y1.shape,
                                   input_dtype=y1.dtype)
            stats = benchmark(lambda s: compiled(dev_params, s),
                              y1, warmup=warmup, iters=iters)
        elif v == "phases":
            from dcfp_tpu.ops.pallas_kernels import extract_stem_phases
            ph = jnp.asarray(np.stack(
                [extract_stem_phases(np.asarray(image)[0])]))
            fn, dev_params = make_inference_fn(
                result.graph, result.params, result.state,
                dtype=jnp.bfloat16, fold_bn=True, output="argmax",
                input_format="phases", input_hw=shape[1:3])
            compiled = aot_compile(fn, dev_params, ph.shape)
            stats = benchmark(lambda img: compiled(dev_params, img),
                              ph, warmup=warmup, iters=iters)
        else:
            pad = 128 if "pad128" in v else 0
            m = re.match(r".*dil(\d+)", v)
            apply_mod.DILATED_MATMUL_MIN = (int(m.group(1)) if m
                                            else default_min)
            fn, dev_params = make_inference_fn(
                result.graph, result.params, result.state,
                dtype=jnp.bfloat16, fold_bn=True, output="argmax",
                pad_stem=pad, split_concat=("csplit" in v))
            compiled = aot_compile(fn, dev_params, shape)
            stats = benchmark(lambda img: compiled(dev_params, img),
                              image, warmup=warmup, iters=iters)
            if v == "base":
                ref_labels = np.asarray(compiled(dev_params, image))
            elif ref_labels is not None:
                agree = (np.asarray(compiled(dev_params, image))
                         == ref_labels).mean()
                print(f"{v} argmax agreement vs base: {agree:.6f}",
                      flush=True)
        print(f"VARIANT {v}: {stats['images_per_sec']:.2f} img/s "
              f"({stats['ms_per_batch']:.2f} ms)", flush=True)
    apply_mod.DILATED_MATMUL_MIN = default_min


if __name__ == "__main__":
    main(sys.argv[1:] or ["base", "nchw", "phases", "int8"])
