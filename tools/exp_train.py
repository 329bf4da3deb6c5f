"""Train-step optimization experiments: time the full jitted train step
(fwd + GSRL loss + bwd + EIC + SGD) at the Cityscapes recipe shape under
candidate settings.

Usage: python tools/exp_train.py [dilated_matmul_min ...]
Default sweeps DILATED_MATMUL_MIN over {18 (current), 8, 4, 2} — the
backward of XLA's native dilated conv (lhs_dilation path) is a suspected
hot spot (docs/ROADMAP.md item 2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.tree.leaves(x)[-1].ravel()[0])


def main(mins):
    import dcfp_tpu.graph.apply as apply_mod
    from dcfp_tpu.engine.optim import build_optimizer
    from dcfp_tpu.engine.trainer import create_train_state, make_train_step
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.losses.criteria import build_criterions
    from dcfp_tpu.models.registry import build_model

    batch, hw = 4, 769
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

    for m in mins:
        apply_mod.DILATED_MATMUL_MIN = int(m)
        model = build_model(
            "deeplabv3", backbone="resnet50",
            backbone_para={"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128},
            num_classes=19, align_corner=True, deepsup=True)
        params, bn = init_graph(model.graph, jax.random.key(0))
        tx = build_optimizer(optim="sgd", learning_rate=0.01, momentum=0.9,
                             weight_decay=5e-4, num_steps=1000, warmup=0)
        state = create_train_state(model, params, bn, tx, prune_type="dcfp")
        crit = build_criterions("gsrl", ignore_label=255)
        step = make_train_step(model, crit, tx, compute_dtype=jnp.bfloat16)

        key = jax.random.key(1)
        t_compile = time.time()
        state, metrics = step(state, b, key)
        sync(metrics)
        print(f"min={m}: compile+first {time.time()-t_compile:.1f}s",
              flush=True)
        for _ in range(2):  # warmup
            state, metrics = step(state, b, key)
        sync(metrics)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, b, key)
        sync(metrics)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"VARIANT dilated_matmul_min={m}: {dt:.1f} ms/step "
              f"({batch * 1000 / dt:.2f} img/s)", flush=True)
        del state, step, model, params, bn
        jax.clear_caches()


if __name__ == "__main__":
    main(sys.argv[1:] or [18, 8, 4, 2])
