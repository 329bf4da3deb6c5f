"""End-to-end learning sanity: the train step must be able to overfit a
2-image synthetic set (validates loss/grad/optimizer/BN wiring beyond
'it runs')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.data.datasets import CityscapesDataset
from dcfp_tpu.data.loader import TrainLoader
from dcfp_tpu.data.synthetic import make_cityscapes_fixture
from dcfp_tpu.engine.optim import build_optimizer
from dcfp_tpu.engine.trainer import create_train_state, make_train_step
from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.losses.criteria import build_criterions
from dcfp_tpu.models.registry import build_model


def test_overfits_two_images(tmp_path, rng):
    root = str(tmp_path / "cs")
    manifest = make_cityscapes_fixture(root, n_images=2, hw=(56, 64))
    ds = CityscapesDataset(root, manifest, split="train",
                           crop_size=(48, 48), scale=False, mirror=False,
                           brightness=False, seed=3)
    loader = TrainLoader(ds, batch_size=2, seed=3, prefetch=0)

    model = build_model(
        "simple", backbone="resnet50",
        backbone_para={"os": 32, "mg_unit": [1, 1, 1], "inplanes": 64},
        num_classes=19, align_corner=False, deepsup=True)
    params, bn = init_graph(model.graph, jax.random.key(0))
    tx = build_optimizer(optim="sgd", learning_rate=0.02, momentum=0.9,
                         weight_decay=0.0, num_steps=400)
    state = create_train_state(model, params, bn, tx)
    crit = build_criterions("ce", ignore_label=255)
    step = make_train_step(model, crit, tx)

    key = jax.random.key(0)
    it = iter(loader)
    first = last = None
    batch = None
    for i in range(120):
        b = next(it)
        batch = {"img": jnp.asarray(b["img"]),
                 "label": jnp.asarray(b["label"].astype(np.int32))}
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        loss = float(m["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
        last = loss
    assert last < first - 1.0, (first, last)  # substantial descent

    # pixel accuracy on the final training batch, eval mode
    outs, _ = graph_apply(model.graph, state.params, state.bn_state,
                          {"image": batch["img"]})
    pred = np.asarray(jnp.argmax(outs["pred"], -1))
    lab = np.asarray(batch["label"])
    valid = lab != 255
    acc = float((pred[valid] == lab[valid]).mean())
    assert acc > 0.4, acc
