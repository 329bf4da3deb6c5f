"""Trainer tests: optimizer parity vs torch, loss descent, EIC semantics,
and the SyncBN/data-parallel invariant on a virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dcfp_tpu.engine.optim import build_optimizer, poly_warmup_schedule
from dcfp_tpu.engine.trainer import (TrainState, create_train_state,
                                     make_train_step)
from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.losses.criteria import build_criterions
from dcfp_tpu.models.heads import SegModel
from dcfp_tpu.parallel.mesh import create_mesh, shard_batch


def tiny_model(num_classes=5, deepsup=False):
    b = GraphBuilder("tiny")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    x = b.conv(x, "c2", out_ch=8, kernel=3)
    x = b.bn(x, "n2")
    x = b.relu(x, "r2")
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=1, padding=0,
                  bias=True)
    outs = [pred]
    if deepsup:
        d = b.conv(x, "deepsup", out_ch=num_classes, kernel=1, padding=0,
                   bias=True)
        outs.append(d)
    g = b.finish(outs)
    g.ignore_prune = []
    return SegModel(g, "tiny", "none", num_classes, False, deepsup, {}, {})


def make_batch(rng, n=8, hw=16, c=5):
    img = rng.standard_normal((n, hw, hw, 3), dtype=np.float32)
    lab = rng.integers(0, c, (n, hw, hw)).astype(np.int32)
    return {"img": jnp.asarray(img), "label": jnp.asarray(lab)}


def test_sgd_momentum_wd_matches_torch(rng):
    """Our optax chain must reproduce torch.optim.SGD(momentum, wd) with the
    poly LR applied per step (the reference's adjust_learning_rate)."""
    import torch
    w0 = rng.standard_normal((4, 3), dtype=np.float32)
    steps, base_lr, wd, mom = 5, 0.1, 5e-4, 0.9
    sched = poly_warmup_schedule(base_lr, 100, 0.9, warmup=2)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=base_lr, momentum=mom, weight_decay=wd)
    grads = [rng.standard_normal((4, 3), dtype=np.float32)
             for _ in range(steps)]
    for i, g in enumerate(grads):
        for group in topt.param_groups:
            group["lr"] = float(sched(jnp.asarray(i)))
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = build_optimizer(optim="sgd", learning_rate=base_lr, momentum=mom,
                         weight_decay=wd, num_steps=100, power=0.9, warmup=2)
    p = {"w": jnp.asarray(w0)}
    s = tx.init(p)
    for g in grads:
        upd, s = tx.update({"w": jnp.asarray(g)}, s, p)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_poly_warmup_schedule_matches_reference_formula():
    """Golden vs the reference's own lr_poly/lr_warmup/adjust_learning_rate
    composition (optimizer.py:60-79), reimplemented verbatim here."""
    def ref_lr(base_lr, i, max_iter, power, warmup, warmup_ratio=1e-6):
        lr = base_lr * ((1 - float(i) / max_iter) ** power)
        if warmup > 0 and i < warmup:
            lr = lr * (1 - (1 - float(i) / warmup) * (1 - warmup_ratio))
        return lr

    for warmup in (-1, 0, 5):
        sched = poly_warmup_schedule(0.01, 40, power=0.9, warmup=warmup)
        got = [float(sched(jnp.asarray(i))) for i in range(40)]
        want = [ref_lr(0.01, i, 40, 0.9, warmup) for i in range(40)]
        # atol covers f32-vs-f64 rounding of (1 - warmup_ratio) at the
        # step-0 warmup floor, where lr itself is ~base_lr * 1e-6
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9,
                                   err_msg=f"warmup={warmup}")


def test_adamw_no_decay_matches_torch(rng):
    """Our optax AdamW chain (scale_by_adam -> decoupled decay -> poly
    lr) must reproduce torch.optim.AdamW, including the reference's
    no_decay keyword groups (optimizer.py:23-49): 'bias' paths get
    weight_decay 0 via the mask, kernels decay."""
    import torch
    steps, base_lr, wd = 5, 1e-3, 0.05
    sched = poly_warmup_schedule(base_lr, 100, 0.9, warmup=2)
    w0 = rng.standard_normal((4, 3), dtype=np.float32)
    b0 = rng.standard_normal((3,), dtype=np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": wd},
         {"params": [tb], "weight_decay": 0.0}],
        lr=base_lr, betas=(0.9, 0.999))
    gws = [rng.standard_normal((4, 3), dtype=np.float32)
           for _ in range(steps)]
    gbs = [rng.standard_normal((3,), dtype=np.float32)
           for _ in range(steps)]
    for i, (gw, gb) in enumerate(zip(gws, gbs)):
        for group in topt.param_groups:
            group["lr"] = float(sched(jnp.asarray(i)))
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        topt.step()

    p = {"w": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = build_optimizer(optim="adamw", learning_rate=base_lr,
                         weight_decay=wd, betas="0.9,0.999",
                         num_steps=100, power=0.9, warmup=2,
                         no_decay="bias", params=p)
    s = tx.init(p)
    for gw, gb in zip(gws, gbs):
        upd, s = tx.update({"w": {"kernel": jnp.asarray(gw),
                                  "bias": jnp.asarray(gb)}}, s, p)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["w"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_train_step_descends_and_eic_updates(rng):
    model = tiny_model(deepsup=True)
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    state = create_train_state(model, params, bn_state, tx,
                               prune_type="dcfp")
    crit = build_criterions("ce", ignore_label=255)
    step = make_train_step(model, crit, tx)

    batch = make_batch(rng)
    key = jax.random.key(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    # random labels: CE floor is ln(5); expect steady descent, not collapse
    assert losses[-1] < losses[0] - 0.05, losses
    assert int(state.step) == 30
    # EIC has accumulated on prunable BNs and stays non-negative
    for name in ["n1", "n2"]:
        e = np.asarray(state.eic[name])
        assert (e >= 0).all() and e.sum() > 0


def test_eic_matches_reference_formula(rng):
    from dcfp_tpu.prune.eic import eic_update
    g = rng.standard_normal(6).astype(np.float32)
    w = rng.standard_normal(6).astype(np.float32)
    eic0 = np.abs(rng.standard_normal(6)).astype(np.float32)
    r = 0.99
    got = np.asarray(eic_update(
        {"bn": jnp.asarray(eic0)}, {"bn": {"scale": jnp.asarray(w)}},
        {"bn": {"scale": jnp.asarray(g)}}, r)["bn"])
    flag = (g * w) > 0
    grad_tmp = flag * np.abs(g) + (~flag) * eic0
    want = eic0 * r + grad_tmp * (1 - r)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_data_parallel_syncbn_invariant(rng):
    """Train-step loss and updated params must be identical whether the
    batch lives on one device or is sharded over an 8-device mesh — this is
    the SyncBN + DDP-grad-allreduce parity property (reference engine.py:65
    convert_sync_batchnorm + DDP)."""
    assert len(jax.devices()) == 8
    model = tiny_model()
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("ce", ignore_label=255)
    step = make_train_step(model, crit, tx)
    batch = make_batch(rng, n=8)
    key = jax.random.key(2)

    s1 = create_train_state(model, params, bn_state, tx)
    s1, m1 = step(s1, batch, key)

    mesh = create_mesh(n_data=4, n_spatial=2)
    sharded = shard_batch(mesh, batch)
    # the train step donates its input state, so build s2 from fresh
    # (identical) buffers rather than the now-consumed ones
    params2, bn_state2 = init_graph(model.graph, jax.random.key(0))
    s2 = create_train_state(model, params2, bn_state2, tx)
    s2, m2 = step(s2, sharded, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for name in ["c1", "c2"]:
        np.testing.assert_allclose(np.asarray(s1.params[name]["kernel"]),
                                   np.asarray(s2.params[name]["kernel"]),
                                   rtol=1e-4, atol=1e-6)
    for name in ["n1", "n2"]:
        np.testing.assert_allclose(np.asarray(s1.bn_state[name]["mean"]),
                                   np.asarray(s2.bn_state[name]["mean"]),
                                   rtol=1e-4, atol=1e-6)


def test_train_loop_windowed_nan_guard(rng):
    """TrainLoop fetches losses once per log window (no per-step host
    sync) and still reports the exact step of the first non-finite loss."""
    from dcfp_tpu.engine.trainer import TrainLoop

    model = tiny_model()
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("ce", ignore_label=255)
    sched = poly_warmup_schedule(0.05, 100, 0.9, warmup=0)
    loop = TrainLoop(model=model, criterion=crit, tx=tx, num_steps=7,
                     lr_schedule=sched, log_every=5)

    def batches(poison_at=None):
        i = 0
        while True:
            b = make_batch(rng, n=2, hw=16)
            if i == poison_at:
                b = dict(b, img=jnp.full_like(b["img"], jnp.inf))
            yield b
            i += 1

    state = create_train_state(model, params, bn_state, tx)
    state = loop.run(state, batches(), jax.random.key(3))
    assert int(state.step) == 7

    params2, bn2 = init_graph(model.graph, jax.random.key(0))
    state2 = create_train_state(model, params2, bn2, tx)
    with pytest.raises(FloatingPointError, match="step 3"):
        loop.run(state2, batches(poison_at=3), jax.random.key(3))


def tiny_resize_model(num_classes=5, deepsup=True):
    """Tiny model whose outputs are resize(to_input) nodes like the real
    heads — triggers the fused loss tail in make_train_step."""
    b = GraphBuilder("tinyr")
    x = b.input("image")
    x = b.conv_bn_relu(x, "s", out_ch=8, kernel=3, stride=2)
    z = b.conv(x, "cls", out_ch=num_classes, kernel=1, padding=0, bias=True)
    outs = [b.resize(z, "pred", to_input=True, align_corners=True)]
    if deepsup:
        d = b.conv(x, "dcls", out_ch=num_classes, kernel=1, padding=0,
                   bias=True)
        outs.append(b.resize(d, "deepsup", to_input=True,
                             align_corners=True))
    g = b.finish(outs)
    g.ignore_prune = []
    return SegModel(g, "tinyr", "none", num_classes, True, deepsup, {}, {})


def test_fused_loss_tail_matches_unfused(rng):
    """fuse_loss_tail moves each head's final upsample out of the graph
    and evaluates the criterion channels-first; loss and the resulting
    update must match the in-graph NHWC path."""
    model = tiny_resize_model()
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("gsrl", ignore_label=255)
    batch = make_batch(rng)
    batch["label"] = {
        "ori": batch["label"],
        "weight": jnp.asarray(rng.random(batch["label"].shape,
                                         dtype=np.float32)),
    }
    key = jax.random.key(1)

    results = []
    for fused in (False, True):
        # fresh copies: the jitted step donates (and deletes) its input state
        state = create_train_state(model, jax.tree.map(jnp.copy, params),
                                   jax.tree.map(jnp.copy, bn_state), tx,
                                   prune_type="dcfp")
        step = make_train_step(model, crit, tx, fuse_loss_tail=fused)
        state, m = step(state, batch, key)
        results.append((float(m["loss"]), state))
    (l0, s0), (l1, s1) = results
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s0.params, s1.params)


def branchy_model(num_classes=5):
    """Residual + concat + dropout + resize heads: enough structure that
    4 remat segments cut through non-trivial liveness."""
    b = GraphBuilder("branchy")
    x = b.input("image")
    x = b.conv_bn_relu(x, "s", out_ch=8, kernel=3, stride=2)
    c = b.conv_bn_relu(x, "b1", out_ch=8, kernel=3)
    c = b.conv(c, "b2", out_ch=8, kernel=3)
    c = b.bn(c, "b2.bn")
    y = b.relu(b.add_([c, x], "res"), "res.r")
    p = b.conv_bn_relu(y, "br", out_ch=4, kernel=1, padding=0)
    cat = b.concat([y, p], "cat")
    z = b.conv_bn_relu(cat, "h", out_ch=8, kernel=3)
    z = b.dropout(z, "drop", rate=0.5)
    z = b.conv(z, "cls", out_ch=num_classes, kernel=1, padding=0, bias=True)
    pred = b.resize(z, "pred", to_input=True, align_corners=True)
    g = b.finish([pred])
    g.ignore_prune = []
    return SegModel(g, "branchy", "none", num_classes, True, False, {}, {})


def test_remat_matches_plain_forward_and_grads(rng):
    """remat_segments must be a pure memory/compute trade: identical
    outputs, BN updates, and gradients (dropout keys replay inside each
    jax.checkpoint segment), with remat actually present in the jaxpr."""
    model = branchy_model()
    g = model.graph
    params, bn_state = init_graph(g, jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    key = jax.random.key(7)

    def loss(p, segs):
        outs, new_bn = graph_apply(g, p, bn_state, {"image": x},
                                   train=True, rng=key,
                                   remat_segments=segs)
        return outs["pred"].sum(), (outs, new_bn)

    (l0, (o0, s0)), g0 = jax.value_and_grad(loss, has_aux=True)(params, 0)
    (l1, (o1, s1)), g1 = jax.value_and_grad(loss, has_aux=True)(params, 4)

    np.testing.assert_array_equal(np.asarray(o0["pred"]),
                                  np.asarray(o1["pred"]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s0, s1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)

    jaxpr = jax.make_jaxpr(lambda p: loss(p, 4)[0])(params)
    assert "remat" in str(jaxpr) or "checkpoint" in str(jaxpr)


def test_remat_train_step_matches_plain(rng):
    """One full train step (fused loss tail + EIC + optimizer) with and
    without remat lands on the same parameters."""
    model = branchy_model()
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("ce", ignore_label=255)
    batch = make_batch(rng, n=4, hw=16)
    key = jax.random.key(3)

    results = []
    for segs in (0, 3):
        state = create_train_state(model, jax.tree.map(jnp.copy, params),
                                   jax.tree.map(jnp.copy, bn_state), tx,
                                   prune_type="dcfp")
        step = make_train_step(model, crit, tx, remat_segments=segs)
        state, m = step(state, batch, key)
        results.append((float(m["loss"]), state))
    (l0, s0), (l1, s1) = results
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s0.params, s1.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s0.eic, s1.eic)


def test_train_loop_signal_snapshot_and_metrics(rng, tmp_path):
    """Preemption grace: a SIGTERM mid-run finishes the in-flight step,
    writes a snapshot, and returns (instead of dying with no artifact —
    the reference's recovery story is a manual --resume).  The JSONL
    metrics file gets one line per log window."""
    import json
    import os
    import signal

    from dcfp_tpu.engine.trainer import TrainLoop

    model = tiny_model()
    params, bn_state = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("ce", ignore_label=255)
    sched = poly_warmup_schedule(0.05, 100, 0.9, warmup=0)
    snaps = []
    metrics_path = str(tmp_path / "metrics.jsonl")
    loop = TrainLoop(model=model, criterion=crit, tx=tx, num_steps=50,
                     lr_schedule=sched, log_every=2,
                     snapshot_hook=lambda st, step: snaps.append(step),
                     handle_signals=True, metrics_file=metrics_path)

    def batches():
        i = 0
        while True:
            if i == 4:  # deliver the signal mid-run
                os.kill(os.getpid(), signal.SIGTERM)
            yield make_batch(rng, n=2, hw=16)
            i += 1

    prev = signal.getsignal(signal.SIGTERM)
    state = create_train_state(model, params, bn_state, tx)
    state = loop.run(state, batches(), jax.random.key(3))
    # stopped early, snapshotted at the stop step, handler restored
    assert int(state.step) == 5
    assert snaps and snaps[-1] == 5
    assert signal.getsignal(signal.SIGTERM) is prev
    lines = [json.loads(ln) for ln in open(metrics_path)]
    assert lines and lines[0]["step"] == 2
    assert all(np.isfinite(ln["loss"]) for ln in lines)


def test_train_step_compiler_options_matches_default(rng):
    """compiler_options routes through lower+compile (AOT-at-first-call);
    a generic option must reproduce the jit-dispatch step exactly."""
    model = tiny_model(deepsup=True)
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=100)
    crit = build_criterions("ce", ignore_label=255)
    batch = make_batch(rng)
    key = jax.random.key(1)

    outs = {}
    # option at its default value: exercises the lower+compile plumbing
    # without changing codegen (non-default values legally re-order
    # float math, e.g. optimization_level=2 drifts 1e-8 on CPU)
    for opts in (None, {"xla_backend_optimization_level": "3"}):
        # fresh params per variant: the step donates its state buffers
        params, bn_state = init_graph(model.graph, jax.random.key(0))
        state = create_train_state(model, params, bn_state, tx,
                                   prune_type="dcfp")
        step = make_train_step(model, crit, tx, compiler_options=opts)
        for _ in range(3):
            state, m = step(state, batch, key)
        outs[opts is None] = (state, m)
    for a, b in zip(jax.tree.leaves(outs[True]), jax.tree.leaves(outs[False])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
