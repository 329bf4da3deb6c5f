"""Checkpoint IO: exact TrainState resume, non-strict merge semantics,
prune-artifact round-trips (reference torch.save/load_model parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.engine.optim import build_optimizer
from dcfp_tpu.engine.trainer import create_train_state, make_train_step
from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.losses.criteria import build_criterions
from dcfp_tpu.models.heads import SegModel
from dcfp_tpu.utils import checkpoint as ckpt


def tiny_model(num_classes=4):
    b = GraphBuilder("tiny")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=1, padding=0,
                  bias=True)
    g = b.finish([pred])
    g.ignore_prune = []
    return SegModel(g, "tiny", "none", num_classes, False, False, {}, {})


def run_steps(state, step_fn, batch, n, key):
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
    return state, m


def test_train_state_resume_exact(rng, tmp_path):
    """Save at step 3, resume, run 2 more steps: bitwise-identical to an
    uninterrupted 5-step run (params, momentum, BN stats, EIC, step)."""
    model = tiny_model()
    tx = build_optimizer(optim="sgd", learning_rate=0.05, momentum=0.9,
                         weight_decay=1e-4, num_steps=50)
    crit = build_criterions("ce")
    step_fn = make_train_step(model, crit, tx)
    batch = {"img": jnp.asarray(rng.standard_normal((2, 8, 8, 3),
                                                    dtype=np.float32)),
             "label": jnp.asarray(rng.integers(0, 4, (2, 8, 8)),
                                  dtype=jnp.int32)}
    key = jax.random.key(0)

    params, bn = init_graph(model.graph, jax.random.key(1))
    s = create_train_state(model, params, bn, tx, prune_type="dcfp")
    s, _ = run_steps(s, step_fn, batch, 3, key)
    path = str(tmp_path / "snap.msgpack")
    ckpt.save_train_state(path, s)
    s_full, _ = run_steps(s, step_fn, batch, 2, key)

    params2, bn2 = init_graph(model.graph, jax.random.key(2))  # different init
    template = create_train_state(model, params2, bn2, tx, prune_type="dcfp")
    s_res = ckpt.load_train_state(path, template)
    assert int(s_res.step) == 3
    s_res, _ = run_steps(s_res, step_fn, batch, 2, key)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.tree.map(np.asarray, s_full.params),
        jax.tree.map(np.asarray, s_res.params))
    np.testing.assert_array_equal(np.asarray(s_full.eic["n1"]),
                                  np.asarray(s_res.eic["n1"]))
    np.testing.assert_array_equal(np.asarray(s_full.bn_state["n1"]["mean"]),
                                  np.asarray(s_res.bn_state["n1"]["mean"]))


def test_non_strict_merge_logs_and_skips(rng, tmp_path):
    """Shape mismatches and absent keys fall back to the template;
    matching keys are copied (utils/pyt_utils.py:43-96 semantics)."""
    template = {"a": {"kernel": np.zeros((3, 3, 4, 8), np.float32)},
                "b": {"scale": np.ones(8, np.float32)}}
    loaded = {"a": {"kernel": np.full((3, 3, 4, 8), 2.0, np.float32)},
              "b": {"scale": np.ones(6, np.float32)},   # pruned width
              "c": {"bias": np.zeros(5, np.float32)}}   # unexpected
    merged, missing, unexpected = ckpt.merge_params(template, loaded)
    assert (merged["a"]["kernel"] == 2.0).all()
    assert (merged["b"]["scale"] == 1.0).all() and merged["b"][
        "scale"].shape == (8,)
    assert any("b/scale" in m for m in missing)
    assert "c/bias" in unexpected


def test_prune_artifacts_roundtrip(tmp_path, rng):
    eic = {"n1": rng.standard_normal(8).astype(np.float32)}
    p = str(tmp_path / "score.msgpack")
    ckpt.save_eic(p, eic)
    np.testing.assert_array_equal(ckpt.load_eic(p)["n1"], eic["n1"])

    cfg = {"c1": {"in_channels": 3, "out_channels": 5,
                  "raw_out_channels": 8,
                  "out_mask": np.array([1, 0, 1, 1, 0, 1, 1, 0], np.int8),
                  "in_mask": np.ones(3, np.int8)}}
    p2 = str(tmp_path / "cfg.msgpack")
    ckpt.save_channel_cfg(p2, cfg)
    back = ckpt.load_channel_cfg(p2)
    assert back["c1"]["out_channels"] == 5
    assert isinstance(back["c1"]["out_channels"], int)
    np.testing.assert_array_equal(back["c1"]["out_mask"],
                                  cfg["c1"]["out_mask"])


def test_load_params_non_strict_from_snapshot(rng, tmp_path):
    model = tiny_model()
    params, bn = init_graph(model.graph, jax.random.key(1))
    tx = build_optimizer(optim="sgd", learning_rate=0.05, num_steps=10)
    s = create_train_state(model, params, bn, tx)
    path = str(tmp_path / "snap.msgpack")
    ckpt.save_train_state(path, s)

    p2, b2 = init_graph(model.graph, jax.random.key(9))
    got_p, got_b = ckpt.load_params_non_strict(path, p2, b2)
    np.testing.assert_array_equal(np.asarray(got_p["c1"]["kernel"]),
                                  np.asarray(params["c1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(got_b["n1"]["var"]),
                                  np.asarray(bn["n1"]["var"]))
