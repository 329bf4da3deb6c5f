"""int8 PTQ deploy path: calibration, per-channel weight quant, int8
interpreter, agreement guardrail."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.engine.quantize import (argmax_agreement,
                                      calibrate_act_scales,
                                      make_int8_inference_fn,
                                      quantize_params)
from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder


def small_net(num_classes=6):
    b = GraphBuilder("q")
    x = b.input("image")
    x = b.conv_bn_relu(x, "s1", out_ch=16, kernel=3, stride=2)
    x = b.conv_bn_relu(x, "s2", out_ch=32, kernel=3)
    x = b.conv(x, "cls", out_ch=num_classes, kernel=1, padding=0, bias=True)
    b.resize(x, "pred", to_input=True, align_corners=False)
    return b.finish(["pred"])


def test_int8_deploy_agreement(rng):
    g = small_net()
    params, state = init_graph(g, jax.random.key(0))
    calib = [rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
             for _ in range(2)]
    fn, bundle = make_int8_inference_fn(g, params, state,
                                        calib_batches=calib,
                                        output="argmax",
                                        compute_dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3),
                                          dtype=np.float32))
    q_labels = np.asarray(jax.jit(fn)(bundle, img))

    outs, _ = graph_apply(g, params, state, {"image": img})
    f_labels = np.asarray(jnp.argmax(outs["pred"], -1))
    agree = argmax_agreement(q_labels, f_labels)
    assert agree > 0.95, agree
    assert q_labels.dtype == np.uint8

    # weights really are int8, per-output-channel scaled
    from dcfp_tpu.engine.deploy import fold_batchnorm
    g2, p2, s2 = fold_batchnorm(g, params, state)
    scales = calibrate_act_scales(g2, p2, s2, calib)
    qp = quantize_params(g2, p2, scales)
    assert qp["s1.conv"]["w_q"].dtype == jnp.int8
    assert int(jnp.max(jnp.abs(qp["s1.conv"]["w_q"]))) == 127
    assert qp["s1.conv"]["rescale"].shape == (16,)


def test_calibration_percentile_clips(rng):
    g = small_net()
    params, state = init_graph(g, jax.random.key(0))
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    x[0, 0, 0, 0] = 1e4  # outlier
    full = calibrate_act_scales(g, params, state, [x], percentile=100.0)
    clipped = calibrate_act_scales(g, params, state, [x], percentile=99.0)
    assert clipped["s1.conv"] < full["s1.conv"]


def residual_net(num_classes=5):
    """Residual + concat topology: exercises int8 chaining through
    relu/add/concat (the requant epilogues)."""
    b = GraphBuilder("qr")
    x = b.input("image")
    x = b.conv_bn_relu(x, "s1", out_ch=16, kernel=3, stride=2)
    x = b.maxpool(x, "s1.pool", kernel=3, stride=1, padding=1)
    y = b.conv_bn_relu(x, "b1", out_ch=16, kernel=3)
    y2 = b.conv(y, "b2.conv", out_ch=16, kernel=3)
    y2 = b.bn(y2, "b2.bn")
    s = b.add_([y2, x], "res.sum")
    s = b.relu(s, "res.relu")
    # ASPP-style global branch: the resize-like target is an int8 tensor
    gp = b.globalpool(s, "gp")
    gp = b.conv_bn_relu(gp, "gpc", out_ch=16, kernel=1, padding=0)
    gp = b.resize(gp, "gp.up", like=s, align_corners=False)
    c = b.concat([s, x, gp], "cat")
    z = b.conv_bn_relu(c, "p1", out_ch=16, kernel=1, padding=0)
    z = b.conv(z, "cls", out_ch=num_classes, kernel=1, padding=0, bias=True)
    b.resize(z, "pred", to_input=True, align_corners=False)
    return b.finish(["pred"])


def test_int8_chaining_agreement_and_coverage(rng):
    """Chained int8 (relu/add/concat stay int8) keeps >=99% argmax
    agreement with the float model, and the interior convs really do
    emit int8 directly (no bf16 bounce)."""
    from dcfp_tpu.engine.quantize import (_emit_scale,
                                          calibrate_tensor_scales)
    from dcfp_tpu.engine.deploy import fold_batchnorm
    g = residual_net()
    params, state = init_graph(g, jax.random.key(1))
    calib = [rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
             for _ in range(2)]
    fn, bundle = make_int8_inference_fn(g, params, state,
                                        calib_batches=calib,
                                        output="argmax",
                                        compute_dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 48, 48, 3),
                                          dtype=np.float32))
    q_labels = np.asarray(jax.jit(fn)(bundle, img))
    outs, _ = graph_apply(g, params, state, {"image": img})
    f_labels = np.asarray(jnp.argmax(outs["pred"], -1))
    # random-weight logits are near-tied, so agreement is noisier than a
    # trained net's; 0.98 still catches any structural quantization break
    assert argmax_agreement(q_labels, f_labels) >= 0.98

    # every conv except the classifier chains (emits int8 directly)
    fg, fp, fs = fold_batchnorm(g, params, state)
    ts = calibrate_tensor_scales(fg, fp, fs, calib)
    emits = {n.name: _emit_scale(fg, n.name, ts) is not None
             for n in fg.conv_nodes()}
    # every interior conv chains in int8 (gpc.conv's direct consumers are
    # identity/relu, so it emits int8; the downstream resize dequantizes
    # locally); only the classifier (a graph output) emits float
    assert emits == {"s1.conv": True, "b1.conv": True, "b2.conv": True,
                     "gpc.conv": True, "p1.conv": True, "cls": False}, emits
