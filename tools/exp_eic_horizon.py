"""EIC signal vs training horizon — does the pruning decision become
signal-dominated before the recipe prunes?

The round-4 convergence golden (tests/test_convergence.py) measured that at
100 pretrain steps the *within-layer* EIC channel ranking is chaos-bounded:
f32 accumulation-order noise decorrelates per-channel gradients within ~2
steps, so cross-framework rank correlation (0.652) sits at the self-noise
floor (0.695).  But the reference prunes after 4,000 steps
(/root/reference/scripts/cs/pretrain.sh:13,31) with an EMA of decay 0.999
(/root/reference/train.py:216, pruners/dcfp_pruner.py:15-20) whose memory is
~1,000 steps — long enough, in principle, to integrate out per-step gradient
chaos.  This experiment runs a pretrain-only two-framework comparison to a
~2,000-step horizon at the convergence test's tiny shapes and tracks, at a
ladder of checkpoints:

  * within-layer EIC Pearson + Spearman(rank) correlation, ours-vs-reference,
    next to the same statistic for ours-vs-ours-under-an-f32-eps-init-
    perturbation (the self-noise floor — the best ANY two runs can do),
  * the between-layer structure (per-layer mean-score correlation), and
  * the DCFP keep-mask agreement the global threshold actually produces
    (global_percent=0.5, layer_keep=0.02, conv_deepsup excepted — the CS
    recipe shape), again ours-vs-ref next to the ours-vs-noise floor.

Hypothesis: correlation rises well above the floor and mask agreement
approaches 1 by the ~1k-step mark.  Either outcome is recorded in
docs/ROADMAP.md; tests/test_convergence.py gates the affordable horizon.

Usage:
    python -m tools.exp_eic_horizon [total_steps] [out_json]
    # checkpoints default to [100, 200, 400, 700, 1000, 1400, 2000] <= total
"""

import json
import sys
import time

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from tests.test_convergence import (LR, MOMENTUM, POWER, WD,  # noqa: E402
                                    build_our_model, build_ref_model,
                                    make_pretrain_batches)
from dcfp_tpu.engine.optim import build_optimizer  # noqa: E402
from dcfp_tpu.engine.trainer import create_train_state, make_train_step  # noqa: E402
from dcfp_tpu.losses.criteria import build_criterions  # noqa: E402
from dcfp_tpu.models.convert import torch_state_dict_to_graph  # noqa: E402
from dcfp_tpu.prune.eic import prunable_bn_names  # noqa: E402
from dcfp_tpu.prune.pruner import DCFPPruner  # noqa: E402
from dcfp_tpu.prune.trace import trace_topology  # noqa: E402

CHECKPOINTS = [100, 200, 400, 700, 1000, 1400, 2000, 2800]
PRUNE_PERCENT = 0.5
LAYER_KEEP = 0.02


def run_ref_with_snapshots(model, batches, num_steps, checkpoints):
    """Reference train loop (train.py:239-288) with EIC snapshots."""
    import torch
    from tests.test_convergence import _ref_modules
    _, _, adjust_learning_rate, set_weight_decay, dcfp_pruning = \
        _ref_modules()
    model.train()
    opt = torch.optim.SGD(set_weight_decay(model, [], []),
                          momentum=MOMENTUM, lr=LR, weight_decay=WD)
    eic = dcfp_pruning(model, r=0.999)
    snaps, t0 = {}, time.time()
    for i, b in enumerate(batches):
        opt.zero_grad()
        adjust_learning_rate(opt, LR, i, num_steps, POWER, 0)
        img = torch.from_numpy(np.transpose(b["img"], (0, 3, 1, 2)).copy())
        lab = torch.from_numpy(b["label"])
        loss = model(img, lab, deepsup=True)
        loss["loss"].backward()
        eic.step(model)
        opt.step()
        if (i + 1) in checkpoints:
            snaps[i + 1] = {k: v.detach().cpu().numpy().copy()
                            for k, v in eic.get_eic()["eic"].items()}
            print(f"  ref step {i+1}/{num_steps} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return snaps


def run_ours_with_snapshots(model, params, bn, batches, num_steps,
                            checkpoints):
    tx = build_optimizer(optim="sgd", learning_rate=LR, momentum=MOMENTUM,
                         weight_decay=WD, num_steps=num_steps, power=POWER,
                         warmup=0)
    state = create_train_state(model, params, bn, tx, prune_type="dcfp")
    crit = build_criterions("ce", ignore_label=255, loss_para={})
    step = make_train_step(model, crit, tx)
    snaps, t0 = {}, time.time()
    for i, b in enumerate(batches):
        state, _ = step(state, jax.tree.map(jnp.asarray, b),
                        jax.random.key(0))
        if (i + 1) in checkpoints:
            snaps[i + 1] = {k: np.asarray(v, np.float64).copy()
                            for k, v in state.eic.items()}
            print(f"  ours step {i+1}/{num_steps} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return snaps


def _rank(x):
    r = np.empty(x.size, np.float64)
    r[np.argsort(x, kind="stable")] = np.arange(x.size, dtype=np.float64)
    return r


def within_layer_corr(a, b, names, rank=False):
    corrs = []
    for n in names:
        x = np.asarray(a[n], np.float64).ravel()
        y = np.asarray(b[n], np.float64).ravel()
        if x.std() > 1e-12 and y.std() > 1e-12:
            if rank:
                x, y = _rank(x), _rank(y)
            corrs.append(float(np.corrcoef(x, y)[0, 1]))
    return float(np.mean(corrs))


def masks_for(eic, graph, topo):
    pruner = DCFPPruner({k: np.asarray(v, np.float32) for k, v in
                         eic.items()}, global_percent=PRUNE_PERCENT,
                        layer_keep=LAYER_KEEP,
                        except_start_keys=["conv_deepsup"])
    return pruner.space_masks(graph, topo)


def mask_agreement(ma, mb):
    agree = np.concatenate([ma[k] == mb[k] for k in sorted(ma)])
    return float(agree.mean())


def main(total, out_path):
    checkpoints = [c for c in CHECKPOINTS if c <= total]
    if not checkpoints or checkpoints[-1] != total:
        checkpoints.append(total)
    print(f"horizon run: {total} steps, checkpoints {checkpoints}",
          flush=True)
    batches = make_pretrain_batches(total)

    ref_model = build_ref_model("ce")
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}
    our_model = build_our_model()
    params, bn, report = torch_state_dict_to_graph(our_model.graph, init_sd)
    assert not report["missing"] and not report["unexpected"]
    params_eps = jax.tree.map(
        lambda x: x * (1 + 1e-6) if np.issubdtype(x.dtype, np.floating)
        else x, jax.tree.map(np.asarray, params))

    print("[1/3] ours", flush=True)
    ours = run_ours_with_snapshots(our_model, params, bn, batches, total,
                                   checkpoints)
    print("[2/3] ours + f32-eps init perturbation (self-noise floor)",
          flush=True)
    noise = run_ours_with_snapshots(our_model, params_eps, bn, batches,
                                    total, checkpoints)
    print("[3/3] reference", flush=True)
    ref = run_ref_with_snapshots(ref_model, batches, total, checkpoints)

    graph, topo = our_model.graph, trace_topology(our_model.graph)
    all_names = sorted(prunable_bn_names(graph))
    names = sorted(set(all_names) & set(ref[checkpoints[0]]))
    assert len(names) >= 0.9 * len(all_names), (len(names), len(all_names))

    rows = []
    for c in checkpoints:
        # names absent on the ref side fall back to ours (same convention
        # as tests/test_convergence.py) so the global threshold pools match
        ref_full = {n: ref[c].get(n, ours[c][n]) for n in all_names}
        m_ours = masks_for(ours[c], graph, topo)
        m_ref = masks_for(ref_full, graph, topo)
        m_noise = masks_for(noise[c], graph, topo)
        row = {
            "steps": c,
            "pearson_ref": within_layer_corr(ours[c], ref[c], names),
            "pearson_floor": within_layer_corr(ours[c], noise[c], names),
            "spearman_ref": within_layer_corr(ours[c], ref[c], names,
                                              rank=True),
            "spearman_floor": within_layer_corr(ours[c], noise[c], names,
                                                rank=True),
            "layer_mean_corr": float(np.corrcoef(
                [np.asarray(ours[c][n]).mean() for n in names],
                [np.asarray(ref[c][n]).mean() for n in names])[0, 1]),
            "mask_agree_ref": mask_agreement(m_ours, m_ref),
            "mask_agree_floor": mask_agreement(m_ours, m_noise),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"total_steps": total, "n_layers": len(names), "rows": rows}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/eic_horizon.json"
    main(total, out)
