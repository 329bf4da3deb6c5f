"""Train-step optimization experiments: time the full jitted train step
(fwd + GSRL loss + bwd + EIC + SGD) at the Cityscapes recipe shape under
candidate settings, plus ablation modes that attribute time to step
components (the backward cannot be suffix-profiled like the deploy
graph, so we ablate instead).

Usage: python tools/exp_train.py [variant ...]
Variants:
  minN      DILATED_MATMUL_MIN=N (e.g. min18 current, min2 rewrite all)
  fwd       forward + loss only, no grad/opt (isolates the backward)
  unfused   in-graph NHWC loss tail (the pre-fusion layout, for A/B)
  ce        CE-DSN loss instead of GSRL (isolates GSRL's extra cost)
  nodeepsup deepsup head off (single-head fwd+bwd)
  noeic     EIC scoring off
  frozenbn  BN in eval mode inside the step (isolates BN-stat cost)
  rematN    N jax.checkpoint segments in the forward (the --remat flag;
            measures the recompute cost and, with DCFP_EXP_BATCH raised,
            the larger batch it buys)
  opt:K=V[,K=V]  compile the base step with XLA compiler options (PJRT
            per-compile overrides, e.g. opt:xla_tpu_scoped_vmem_limit_kib=65536
            — same channel as deploy --xla-options)
Env: DCFP_EXP_BATCH (default 4), DCFP_EXP_HW (crop, default 769),
DCFP_EXP_MODEL / DCFP_EXP_BACKBONE (default deeplabv3 / resnet50;
hrnet* backbones get {"pretrained": False} para).
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

from _common import clear_env_compiler_options, default_backbone_para


def sync(x):
    return np.asarray(jax.tree.leaves(x)[-1].ravel()[0])


def main(variants):
    clear_env_compiler_options()
    import dcfp_tpu.graph.apply as apply_mod
    from dcfp_tpu.engine.optim import build_optimizer
    from dcfp_tpu.engine.trainer import create_train_state, make_train_step
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.losses.criteria import build_criterions
    from dcfp_tpu.models.registry import build_model

    batch = int(os.environ.get("DCFP_EXP_BATCH", "4"))
    hw = int(os.environ.get("DCFP_EXP_HW", "769"))
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 19, (batch, hw, hw)).astype(np.int32)
    b = {
        "img": jnp.asarray(rng.standard_normal(
            (batch, hw, hw, 3)).astype(np.float32)),
        "label": {
            "ori": jnp.asarray(lab),
            "weight": jnp.asarray(rng.uniform(
                0.5, 2.0, (batch, hw, hw)).astype(np.float32)),
        },
    }
    default_min = apply_mod.DILATED_MATMUL_MIN

    for v in variants:
        apply_mod.DILATED_MATMUL_MIN = (
            int(v[3:]) if v.startswith("min") else default_min)
        deepsup = v != "nodeepsup"
        head = os.environ.get("DCFP_EXP_MODEL", "deeplabv3")
        backbone = os.environ.get("DCFP_EXP_BACKBONE", "resnet50")
        bpara = default_backbone_para(backbone)
        model = build_model(
            head, backbone=backbone, backbone_para=bpara,
            num_classes=19, align_corner=True, deepsup=deepsup)
        params, bn = init_graph(model.graph, jax.random.key(0))
        crit = build_criterions("ce" if v == "ce" else "gsrl",
                                ignore_label=255)
        key = jax.random.key(1)

        if v == "fwd":
            @jax.jit
            def step(params, bn, b, key):
                img = b["img"].astype(jnp.bfloat16)
                preds, _ = graph_apply(model.graph, params, bn,
                                       {"image": img}, train=True, rng=key)
                return crit(preds, b["label"])["loss"]

            t_c = time.time()
            sync(step(params, bn, b, key))
            print(f"{v}: compile+first {time.time()-t_c:.1f}s", flush=True)
            for _ in range(2):
                out = step(params, bn, b, key)
            sync(out)
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(params, bn, b, key)
            sync(out)
        else:
            tx = build_optimizer(optim="sgd", learning_rate=0.01,
                                 momentum=0.9, weight_decay=5e-4,
                                 num_steps=1000, warmup=0)
            if v == "frozenbn":
                import dcfp_tpu.engine.trainer as trainer_mod
                orig_apply = trainer_mod.graph_apply

                def frozen_apply(g, p, s, i, *, train=False, rng=None,
                                 **kw):
                    return orig_apply(g, p, s, i, train=False, rng=rng,
                                      **kw)
                trainer_mod.graph_apply = frozen_apply
            state = create_train_state(
                model, params, bn,
                tx, prune_type=None if v == "noeic" else "dcfp")
            step = make_train_step(model, crit, tx,
                                   compute_dtype=jnp.bfloat16,
                                   fuse_loss_tail=(v != "unfused"),
                                   remat_segments=(int(v[5:])
                                                   if v.startswith("remat")
                                                   else 0))
            if v.startswith("opt:"):
                from dcfp_tpu.engine.deploy import parse_compiler_options
                opts = parse_compiler_options(v[4:], source="opt:")
                step = step.lower(state, b, key).compile(opts)
            t_c = time.time()
            state, metrics = step(state, b, key)
            sync(metrics)
            print(f"{v}: compile+first {time.time()-t_c:.1f}s", flush=True)
            for _ in range(2):
                state, metrics = step(state, b, key)
            sync(metrics)
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, b, key)
            sync(metrics)
            if v == "frozenbn":
                trainer_mod.graph_apply = orig_apply
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"VARIANT {v} (batch {batch}): {dt:.1f} ms/step "
              f"({batch * 1000 / dt:.2f} img/s)", flush=True)
        jax.clear_caches()
    apply_mod.DILATED_MATMUL_MIN = default_min


if __name__ == "__main__":
    main(sys.argv[1:] or ["min18", "min2", "fwd", "ce", "nodeepsup",
                          "noeic", "frozenbn"])
