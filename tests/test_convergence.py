"""Convergence-length training-parity golden vs the reference trainer.

The 4-step dynamics goldens (test_dynamics.py) certify step-level parity;
this test certifies the *long horizon*: a few-hundred-step two-framework
run of the full DCFP pipeline — pretrain-with-EIC (ce+deepsup) -> DCFP
prune -> finetune-at-pruned-widths (gsrl, balance-2 weights, class-uniform
resampling, warmup) — on synthetic long-tail data, where LR decay, BN
running statistics, EIC accumulation, weight decay and resampling all
interact (reference hot loop: train.py:239-288; recipe:
scripts/cs/finetune.sh:8-40).

Exact per-step parity is chaotic at this horizon (f32 accumulation-order
noise decorrelates gradients within ~2 steps — measured in
test_dynamics.py), so the comparisons here are the *statistical* ones a
practitioner would use to declare two trainers equivalent:

  1. per-window mean-loss trajectories of both phases,
  2. the final EIC pruning decision (per-layer rank correlation and the
     global keep-mask the DCFP threshold actually produces),
  3. end-state mIoU of an eval-mode forward on a held-out batch —
     both frameworks must learn, and land together.

Tolerances were set from measured runs (see docs/ROADMAP.md "Round-4
convergence-parity golden") at ~2.4-3.5x the observed deltas.

Run standalone for the measurement mode (prints the stats JSON):
    python -m tests.test_convergence [pretrain_steps finetune_steps]
"""

import json
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.engine.optim import build_optimizer
from dcfp_tpu.engine.trainer import create_train_state, make_train_step
from dcfp_tpu.graph.apply import graph_apply
from dcfp_tpu.losses.criteria import build_criterions
from dcfp_tpu.models.convert import (channel_cfg_to_torch,
                                     torch_state_dict_to_graph,
                                     to_torch_state_dict)
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.prune.eic import prunable_bn_names
from dcfp_tpu.prune.pruner import DCFPPruner, apply_channel_cfg
from dcfp_tpu.prune.trace import trace_topology

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
if HAS_REF and REF not in sys.path:
    sys.path.insert(0, REF)

# -- configuration: a shrunken CS recipe -------------------------------------
# DeepLabV3-R50 os8 mg[1,2,4] like scripts/cs/*.sh, at 33 px / inplanes 64 /
# batch 2 so a ~260-step two-framework run fits a CPU test budget.
C = 19
HW = 33
BATCH = 2
IGNORE = 255
BPARA = {"os": 8, "mg_unit": [1, 2, 4], "inplanes": 64}
LR, MOMENTUM, WD, POWER = 0.01, 0.9, 5e-4, 0.9
BETA = 0.9999            # balance-2 effective-number beta (Base.py:26)
N_PRETRAIN = int(os.environ.get("DCFP_CONV_PRE", 100))
N_FINETUNE = int(os.environ.get("DCFP_CONV_FT", 160))
FT_WARMUP = 10
PRUNE_PERCENT = 0.5
WINDOW = 20

# long-tail class prior: geometric decay, head class ~60x the tail class
FREQ = 0.72 ** np.arange(C)
FREQ /= FREQ.sum()


def _palette(rng):
    return rng.uniform(-1.0, 1.0, (C, 3)).astype(np.float32)


def _gen_sample(rng, palette, target_class=None):
    """One synthetic long-tail sample: blobby label map + class-colored
    image.  ``target_class`` emulates the resample path (Base.py:203-222):
    the crop is centered on a region of that class."""
    lab = np.full((HW, HW), rng.choice(C, p=FREQ), np.int64)
    for _ in range(4):
        c = rng.choice(C, p=FREQ)
        h = rng.integers(HW // 5, HW // 2)
        w = rng.integers(HW // 5, HW // 2)
        y = rng.integers(0, HW - h)
        x = rng.integers(0, HW - w)
        lab[y:y + h, x:x + w] = c
    if target_class is not None:
        h = rng.integers(HW // 4, HW // 2)
        w = rng.integers(HW // 4, HW // 2)
        y = (HW - h) // 2
        x = (HW - w) // 2
        lab[y:y + h, x:x + w] = target_class
    img = palette[lab] + 0.35 * rng.standard_normal(
        (HW, HW, 3)).astype(np.float32)
    lab[rng.random((HW, HW)) < 0.04] = IGNORE
    return img, lab


def _balance2_weight(lab, target_class):
    """Effective-number pixel weights (reference Base.py:73-89 balance=2;
    ours data/base.py:145-153), relative to the resampled class."""
    lb = lab.copy()
    lb[lab == IGNORE] = C
    class_num = np.bincount(lb.reshape(-1), minlength=C + 1)[:-1]
    w = ((1 + 1e-8 - BETA ** class_num[target_class]) /
         (1 + 1e-8 - BETA ** class_num))
    w = np.clip(w, 0.0, 1.0)
    w = np.append(w, 0.0)
    return w[lb].astype(np.float32)


def make_pretrain_batches(n, seed=11):
    """i.i.d. long-tail stream, plain labels (ce phase)."""
    rng = np.random.default_rng(seed)
    palette = _palette(np.random.default_rng(3))
    out = []
    for _ in range(n):
        imgs, labs = zip(*[_gen_sample(rng, palette) for _ in range(BATCH)])
        out.append({"img": np.stack(imgs), "label": np.stack(labs)})
    return out


def make_finetune_batches(n, seed=13):
    """Class-uniform resampled stream with balance-2 weight maps (the
    finetune recipe: gsrl + balance 2 + resample)."""
    rng = np.random.default_rng(seed)
    palette = _palette(np.random.default_rng(3))
    out = []
    for _ in range(n):
        imgs, labs, ws = [], [], []
        for _ in range(BATCH):
            tc = int(rng.integers(0, C))  # resample: uniform over classes
            img, lab = _gen_sample(rng, palette, target_class=tc)
            imgs.append(img)
            labs.append(lab)
            ws.append(_balance2_weight(lab, tc))
        out.append({"img": np.stack(imgs),
                    "label": {"ori": np.stack(labs), "weight": np.stack(ws)}})
    return out


def make_eval_batch(n=16, seed=29):
    """Held-out i.i.d. long-tail batch (the val distribution)."""
    rng = np.random.default_rng(seed)
    palette = _palette(np.random.default_rng(3))
    imgs, labs = zip(*[_gen_sample(rng, palette) for _ in range(n)])
    return np.stack(imgs), np.stack(labs)


def miou(pred, lab):
    """Shared numpy mIoU so the metric itself cannot mask a model gap."""
    valid = lab != IGNORE
    conf = np.bincount(lab[valid] * C + pred[valid],
                       minlength=C * C).reshape(C, C)
    inter = np.diag(conf).astype(np.float64)
    union = conf.sum(0) + conf.sum(1) - inter
    with np.errstate(invalid="ignore"):
        iou = inter / union
    return float(np.nanmean(iou))


# -- reference side -----------------------------------------------------------

def _ref_modules():
    import torch  # noqa: F401
    if "ordered_set" not in sys.modules:
        shim = types.ModuleType("ordered_set")
        shim.OrderedSet = list
        sys.modules["ordered_set"] = shim
    import networks
    from loss.criterion import build_criterions as ref_build
    from optimizer import adjust_learning_rate, set_weight_decay
    from pruners import dcfp_pruning
    return networks, ref_build, adjust_learning_rate, set_weight_decay, \
        dcfp_pruning


def build_ref_model(loss_type, deepsup=True, seed=0):
    import torch
    networks, ref_build, *_ = _ref_modules()
    dataset = types.SimpleNamespace(ignore_label=IGNORE, class_weights=None,
                                    num_classes=C)
    criterion = ref_build(loss_type, dataset, {})
    torch.manual_seed(seed)
    model = networks.deeplabv3.Seg_Model(
        backbone="resnet50", backbone_para=dict(BPARA, pretrained=False),
        model_para={}, num_classes=C, align_corner=True,
        criterion=criterion, deepsup=deepsup)
    for m in model.modules():  # dropout RNG streams can't be aligned
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    return model


def run_reference_phase(model, batches, num_steps, warmup, with_eic):
    """Train ``model`` in place over ``batches`` (reference train.py loop);
    returns (per-step losses, final eic dict or None)."""
    import torch
    _, _, adjust_learning_rate, set_weight_decay, dcfp_pruning = \
        _ref_modules()
    model.train()
    groups = set_weight_decay(model, [], [])
    opt = torch.optim.SGD(groups, momentum=MOMENTUM, lr=LR, weight_decay=WD)
    eic = dcfp_pruning(model, r=0.999) if with_eic else None
    losses = []
    for i, b in enumerate(batches):
        opt.zero_grad()
        adjust_learning_rate(opt, LR, i, num_steps, POWER, warmup)
        img = torch.from_numpy(np.transpose(b["img"], (0, 3, 1, 2)).copy())
        if isinstance(b["label"], dict):
            lab = {"ori": torch.from_numpy(b["label"]["ori"]),
                   "weight": torch.from_numpy(b["label"]["weight"])}
        else:
            lab = torch.from_numpy(b["label"])
        loss = model(img, lab, deepsup=True)
        losses.append(float(loss["loss"].detach()))
        loss["loss"].backward()
        if eic is not None:
            eic.step(model)
        opt.step()
    final_eic = ({k: v.numpy().copy() for k, v in
                  eic.get_eic()["eic"].items()} if eic is not None else None)
    return losses, final_eic


def ref_eval_miou(model, imgs, labs):
    import torch
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy()))
    logits = out[0] if isinstance(out, (list, tuple)) else out
    pred = logits.argmax(1).numpy()
    return miou(pred, labs)


# -- our side -----------------------------------------------------------------

def build_our_model(channel_cfg=None):
    import dataclasses
    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para=dict(BPARA), num_classes=C,
                        align_corner=True, deepsup=True)
    if channel_cfg is not None:
        model = dataclasses.replace(
            model, graph=apply_channel_cfg(model.graph, channel_cfg))
    for node in model.graph.toposorted():  # match the torch side: p=0
        if node.op == "dropout":
            node.attrs["rate"] = 0.0
    return model


def run_our_phase(model, params, bn, batches, num_steps, warmup, loss_type,
                  with_eic):
    tx = build_optimizer(optim="sgd", learning_rate=LR, momentum=MOMENTUM,
                         weight_decay=WD, num_steps=num_steps, power=POWER,
                         warmup=warmup)
    state = create_train_state(model, params, bn, tx,
                               prune_type="dcfp" if with_eic else None)
    crit = build_criterions(loss_type, ignore_label=IGNORE, loss_para={})
    step = make_train_step(model, crit, tx)
    losses = []
    for b in batches:
        batch = jax.tree.map(jnp.asarray, b)
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    return state, losses


def our_eval_miou(model, params, bn, imgs, labs):
    outs, _ = graph_apply(model.graph, params, bn,
                          {"image": jnp.asarray(imgs)}, train=False)
    pred = np.asarray(jnp.argmax(outs["pred"], -1))
    return miou(pred, labs)


# -- the full pipeline --------------------------------------------------------

def window_means(losses, w=WINDOW):
    n = len(losses) // w
    return np.asarray(losses[:n * w], np.float64).reshape(n, w).mean(1)


def run_convergence(n_pre=N_PRETRAIN, n_ft=N_FINETUNE):
    import torch
    stats = {"n_pre": n_pre, "n_ft": n_ft}
    pre_batches = make_pretrain_batches(n_pre)
    ft_batches = make_finetune_batches(n_ft)
    eval_imgs, eval_labs = make_eval_batch()

    # -- phase A: pretrain with EIC (ce+deepsup), identical converted init
    ref_model = build_ref_model("ce")
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}
    our_model = build_our_model()
    params, bn, report = torch_state_dict_to_graph(our_model.graph, init_sd)
    assert not report["missing"] and not report["unexpected"]
    stats["miou_init"] = our_eval_miou(our_model, params, bn,
                                       eval_imgs, eval_labs)

    ref_pre_losses, ref_eic = run_reference_phase(
        ref_model, pre_batches, n_pre, 0, with_eic=True)
    our_state, our_pre_losses = run_our_phase(
        our_model, params, bn, pre_batches, n_pre, 0, "ce", with_eic=True)
    stats["pre_windows_ref"] = window_means(ref_pre_losses).tolist()
    stats["pre_windows_ours"] = window_means(our_pre_losses).tolist()

    # -- chaos floor: our framework vs ITSELF with an f32-epsilon init
    # perturbation.  Over ~100 steps f32 accumulation-order noise fully
    # decorrelates per-channel gradients (measured in test_dynamics.py),
    # so the within-layer EIC correlation attainable by ANY two runs is
    # bounded by this, not by framework parity.
    params_eps = jax.tree.map(
        lambda x: x * (1 + 1e-6) if np.issubdtype(x.dtype, np.floating)
        else x, jax.tree.map(np.asarray, params))
    noise_state, _ = run_our_phase(
        our_model, params_eps, bn, pre_batches, n_pre, 0, "ce",
        with_eic=True)

    # -- EIC comparison: per-layer rank correlation + the actual decision
    all_names = sorted(prunable_bn_names(our_model.graph))
    our_eic = {n: np.asarray(our_state.eic[n], np.float64) for n in all_names}
    names = sorted(set(all_names) & set(ref_eic))
    assert len(names) >= 50, len(names)
    assert len(names) >= 0.9 * len(all_names), (len(names), len(all_names))
    def within_layer_corr(a, b):
        corrs = []
        for n in names:
            x, y = np.asarray(a[n], np.float64), np.asarray(b[n], np.float64)
            if x.std() > 1e-12 and y.std() > 1e-12:
                corrs.append(float(np.corrcoef(x, y)[0, 1]))
        return float(np.mean(corrs)), len(corrs)

    noise_eic = {n: np.asarray(noise_state.eic[n], np.float64)
                 for n in names}
    stats["eic_corr_mean"], stats["eic_layers"] = within_layer_corr(
        our_eic, ref_eic)
    stats["eic_selfnoise_corr_mean"], _ = within_layer_corr(
        our_eic, noise_eic)

    # between-layer structure (what the global DCFP threshold consumes):
    # the vector of per-layer mean scores must correlate across frameworks
    lm_ours = np.array([our_eic[n].mean() for n in names])
    lm_ref = np.array([np.asarray(ref_eic[n], np.float64).mean()
                       for n in names])
    stats["eic_layer_mean_corr"] = float(np.corrcoef(lm_ours, lm_ref)[0, 1])

    def prune_with(eic_dict, params_, state_):
        res = DCFPPruner({k: v.astype(np.float32) for k, v in
                          eic_dict.items()}, global_percent=PRUNE_PERCENT,
                         layer_keep=0.02,
                         except_start_keys=["conv_deepsup"]
                         ).prune_model(our_model.graph, params_, state_)
        return res, {k: np.asarray(v["out_mask"], bool)
                     for k, v in res.channel_cfg.items()
                     if "out_mask" in v}

    # -- prune OUR end state; both frameworks finetune from the identical
    #    pruned checkpoint (the reference loads it through its own
    #    init_pruned_model + load path, train.py:200-210)
    res_ft, our_masks = prune_with(our_eic, our_state.params,
                                   our_state.bn_state)
    _, ref_masks = prune_with(
        {n: np.asarray(ref_eic.get(n, our_eic[n]), np.float64)
         for n in all_names}, our_state.params, our_state.bn_state)
    agree = np.concatenate(
        [our_masks[k] == ref_masks[k] for k in sorted(our_masks)])
    stats["mask_agreement"] = float(agree.mean())

    # where the masks DISAGREE, the channels must sit at the quantile
    # boundary: each disagreeing channel's EIC score, mapped through its
    # own framework's pool CDF, lands within eps of the global_percent
    # cut.  (A systematic cross-framework bias moving channels FAR from
    # the threshold would pass the agreement gate alone — this makes the
    # "disagreements sit at the boundary" claim checkable, in the same
    # quantile units the DCFP threshold is defined in,
    # dcfp_pruner.py:43-66.)  Conv-level masks, pre-OR: the per-conv
    # decision is exactly score > thresh[pool].
    ref_eic_full = {n: np.asarray(ref_eic.get(n, our_eic[n]), np.float64)
                    for n in all_names}
    topo = trace_topology(our_model.graph)

    def conv_level(eic_dict):
        pruner = DCFPPruner(
            {k: np.asarray(v, np.float32) for k, v in eic_dict.items()},
            global_percent=PRUNE_PERCENT, layer_keep=0.02,
            except_start_keys=["conv_deepsup"])
        exc = pruner._except_layers(our_model.graph, topo)
        pools = [[], []]
        for bn in topo.norm_conv:
            if bn not in exc and bn in eic_dict:
                pools[DCFPPruner.bn_group(bn)].append(
                    np.asarray(eic_dict[bn], np.float64).ravel())
        cdfs = [np.sort(np.concatenate(p)) if p else np.zeros(0)
                for p in pools]
        return pruner.conv_masks(our_model.graph, topo, exc), cdfs

    def quantile_of(cdfs, g, s):
        pool = cdfs[g]
        return np.searchsorted(pool, s, side="right") / pool.size

    cm_ours, cdf_ours = conv_level(our_eic)
    cm_ref, cdf_ref = conv_level(ref_eic_full)
    dists = []
    for conv in sorted(set(cm_ours) & set(cm_ref)):
        dis = cm_ours[conv] != cm_ref[conv]
        if not dis.any():
            continue
        bn = topo.conv_norm[conv]
        g = DCFPPruner.bn_group(bn)
        qa = quantile_of(cdf_ours, g,
                         np.asarray(our_eic[bn], np.float64).ravel())
        qb = quantile_of(cdf_ref, g,
                         np.asarray(ref_eic_full[bn], np.float64).ravel())
        d = np.maximum(np.abs(qa - PRUNE_PERCENT),
                       np.abs(qb - PRUNE_PERCENT))[dis]
        dists.extend(d.tolist())
    dists = np.asarray(dists)
    stats["mask_disagree_count"] = int(dists.size)
    stats["mask_disagree_q_mean"] = (
        float(dists.mean()) if dists.size else 0.0)
    stats["mask_disagree_q_p95"] = (
        float(np.percentile(dists, 95)) if dists.size else 0.0)
    stats["mask_disagree_q_max"] = (
        float(dists.max()) if dists.size else 0.0)
    cfg_torch = channel_cfg_to_torch(res_ft.channel_cfg)
    pruned_sd = to_torch_state_dict(res_ft.params, res_ft.state)

    from pruners.channel_pruner import init_pruned_model
    ref_ft_model = build_ref_model("gsrl")
    init_pruned_model(ref_ft_model, cfg_torch)
    missing, _ = ref_ft_model.load_state_dict(pruned_sd, strict=False)
    assert not [k for k in missing if "num_batches" not in k], missing
    ft_init_sd = {k: v.clone() for k, v in ref_ft_model.state_dict().items()}

    our_ft_model = build_our_model(channel_cfg=res_ft.channel_cfg)
    ft_params, ft_bn, report = torch_state_dict_to_graph(
        our_ft_model.graph, ft_init_sd)
    assert not report["missing"] and not report["unexpected"]

    # -- phase B: finetune at pruned widths (gsrl + balance2 + resample)
    ref_ft_losses, _ = run_reference_phase(
        ref_ft_model, ft_batches, n_ft, FT_WARMUP, with_eic=False)
    our_ft_state, our_ft_losses = run_our_phase(
        our_ft_model, ft_params, ft_bn, ft_batches, n_ft, FT_WARMUP,
        "gsrl", with_eic=False)
    stats["ft_windows_ref"] = window_means(ref_ft_losses).tolist()
    stats["ft_windows_ours"] = window_means(our_ft_losses).tolist()

    # -- end state: held-out eval-mode mIoU
    stats["miou_ref"] = ref_eval_miou(ref_ft_model, eval_imgs, eval_labs)
    stats["miou_ours"] = our_eval_miou(
        our_ft_model, our_ft_state.params, our_ft_state.bn_state,
        eval_imgs, eval_labs)
    return stats


# -- the test -----------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_convergence_parity():
    stats = run_convergence()

    # per-window loss trajectories track (measured max rel delta 2.1%
    # pretrain / 1.6% finetune, re-confirmed by a fresh measurement-mode
    # run; tolerance ~2.4x — see docs/ROADMAP.md round-4 convergence
    # section for the measurement run)
    for phase in ["pre", "ft"]:
        ours = np.asarray(stats[f"{phase}_windows_ours"])
        ref = np.asarray(stats[f"{phase}_windows_ref"])
        rel = np.abs(ours - ref) / np.abs(ref)
        assert rel.max() < 0.05, (phase, rel.round(4).tolist())

    # the pruning decision matches where signal exists.  Within-layer
    # channel rankings are chaos-bounded at this horizon (the self-noise
    # baseline — our framework vs itself under an f32-epsilon init
    # perturbation — decorrelates just as hard), so the cross-framework
    # correlation is gated RELATIVE to that floor; the between-layer
    # score structure and the actual global-threshold keep masks are
    # signal-dominated and gated absolutely.
    assert (stats["eic_corr_mean"] >
            stats["eic_selfnoise_corr_mean"] - 0.15), stats
    assert stats["eic_layer_mean_corr"] > 0.9, stats["eic_layer_mean_corr"]
    assert stats["mask_agreement"] > 0.85, stats["mask_agreement"]

    # disagreement STRUCTURE (the round-4 "disagreements sit at the
    # quantile boundary" claim, made checkable — and found FALSE at this
    # horizon): measured p95 pool-quantile distance is 0.461, i.e.
    # disagreeing channels spread nearly uniformly over the pool (the
    # pure-chaos expectation for max-of-two-uniforms is p95≈0.487, the
    # metric caps at 0.5).  They are chaos rank swaps, consistent with
    # the chaos-bounded within-layer correlation above — NOT boundary
    # jitter.  The gate pins the measured chaos regime: a systematic
    # cross-framework bias pushing disagreements to the pool extremes
    # would exceed it.  Whether boundary concentration emerges once the
    # 0.999-EMA integrates out per-step chaos is measured vs horizon by
    # tools/exp_eic_horizon.py (docs/ROADMAP.md round-5).
    assert stats["mask_disagree_q_p95"] < 0.49, stats

    # both frameworks learned (mIoU well above the shared init), and
    # landed together (measured |delta| 0.0055 on the CPU backend at
    # mIoU ~0.02-0.05; tolerance ~3.5x)
    assert stats["miou_ours"] > 3 * stats["miou_init"], stats
    assert stats["miou_ref"] > 3 * stats["miou_init"], stats
    assert abs(stats["miou_ours"] - stats["miou_ref"]) < 0.02, stats


if __name__ == "__main__":
    # the axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend the
    # same way tests/conftest.py does so measurement mode matches the suite
    jax.config.update("jax_platforms", "cpu")
    n_pre = int(sys.argv[1]) if len(sys.argv) > 1 else N_PRETRAIN
    n_ft = int(sys.argv[2]) if len(sys.argv) > 2 else N_FINETUNE
    print(json.dumps(run_convergence(n_pre, n_ft), indent=1))
