"""Golden-value tests: graph IR ops vs torch (CPU) reference semantics.

The reference framework is pure PyTorch; torch-cpu is available in the test
environment, so we validate our NHWC/HWIO implementations against torch's
NCHW/OIHW ops numerically instead of trusting a re-derivation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.ops.pool import adaptive_avg_pool, max_pool
from dcfp_tpu.ops.resize import resize_bilinear


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("kernel,stride,dilation", [
    (1, 1, 1), (3, 1, 1), (3, 2, 1), (3, 1, 2), (3, 1, 4), (7, 2, 1),
])
def test_conv_matches_torch(rng, kernel, stride, dilation):
    x = rng.standard_normal((2, 17, 19, 5), dtype=np.float32)
    w = rng.standard_normal((kernel, kernel, 5, 7), dtype=np.float32)
    pad = dilation * (kernel - 1) // 2

    b = GraphBuilder()
    i = b.input("image", channels=5)
    c = b.conv(i, "c", out_ch=7, kernel=kernel, stride=stride,
               dilation=dilation)
    g = b.finish([c])
    out, _ = graph_apply(g, {"c": {"kernel": jnp.asarray(w)}}, {},
                         {"image": jnp.asarray(x)})

    ref = tF.conv2d(nchw(x), torch.from_numpy(
        np.transpose(w, (3, 2, 0, 1)).copy()), stride=stride,
        padding=pad, dilation=dilation)
    np.testing.assert_allclose(np.asarray(out["c"]), to_nhwc(ref),
                               rtol=1e-4, atol=1e-4)


def test_bn_train_and_eval_match_torch(rng):
    x = rng.standard_normal((4, 9, 9, 6), dtype=np.float32)
    scale = rng.standard_normal(6).astype(np.float32)
    bias = rng.standard_normal(6).astype(np.float32)
    run_mean = rng.standard_normal(6).astype(np.float32)
    run_var = np.abs(rng.standard_normal(6)).astype(np.float32) + 0.5

    b = GraphBuilder()
    i = b.input("image", channels=6)
    n = b.bn(i, "bn")
    g = b.finish([n])
    params = {"bn": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    state = {"bn": {"mean": jnp.asarray(run_mean),
                    "var": jnp.asarray(run_var)}}

    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
        tbn.running_mean.copy_(torch.from_numpy(run_mean))
        tbn.running_var.copy_(torch.from_numpy(run_var))

    # train mode: batch stats + running stat update
    out, new_state = graph_apply(g, params, state,
                                 {"image": jnp.asarray(x)}, train=True)
    tbn.train()
    ref = tbn(nchw(x))
    np.testing.assert_allclose(np.asarray(out["bn"]), to_nhwc(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode: running stats
    out, _ = graph_apply(g, params, state, {"image": jnp.asarray(x)},
                         train=False)
    tbn2 = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn2.weight.copy_(torch.from_numpy(scale))
        tbn2.bias.copy_(torch.from_numpy(bias))
        tbn2.running_mean.copy_(torch.from_numpy(run_mean))
        tbn2.running_var.copy_(torch.from_numpy(run_var))
    tbn2.eval()
    ref = tbn2(nchw(x))
    np.testing.assert_allclose(np.asarray(out["bn"]), to_nhwc(ref),
                               rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((2, 13, 15, 4), dtype=np.float32)
    y = max_pool(jnp.asarray(x), 3, 2, 1)
    ref = tF.max_pool2d(nchw(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), atol=1e-6)


@pytest.mark.parametrize("out_size", [1, 2, 3, 6])
def test_adaptive_avgpool_matches_torch(rng, out_size):
    x = rng.standard_normal((2, 13, 17, 4), dtype=np.float32)
    y = adaptive_avg_pool(jnp.asarray(x), out_size)
    ref = tF.adaptive_avg_pool2d(nchw(x), out_size)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [((7, 9), (21, 27)), ((16, 16), (5, 7)),
                                   ((8, 8), (8, 8)), ((1, 1), (4, 4))])
def test_bilinear_resize_matches_torch(rng, align, shape):
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((2, h, w, 3), dtype=np.float32)
    y = resize_bilinear(jnp.asarray(x), (oh, ow), align_corners=align)
    ref = tF.interpolate(nchw(x), size=(oh, ow), mode="bilinear",
                         align_corners=align)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref),
                               rtol=1e-4, atol=1e-5)


def test_residual_block_grads_flow(rng):
    """End-to-end: tiny residual block forward + grad under jit."""
    b = GraphBuilder()
    i = b.input("image", channels=4)
    c1 = b.conv(i, "c1", out_ch=8, kernel=3)
    n1 = b.bn(c1, "n1")
    r1 = b.relu(n1, "r1")
    c2 = b.conv(r1, "c2", out_ch=8, kernel=3)
    n2 = b.bn(c2, "n2")
    ds = b.conv(i, "ds", out_ch=8, kernel=1)
    dn = b.bn(ds, "dn")
    s = b.add_([n2, dn], "sum")
    out = b.relu(s, "out")
    g = b.finish([out])

    params, state = init_graph(g, jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))

    @jax.jit
    def loss_fn(p):
        outs, _ = graph_apply(g, p, state, {"image": x}, train=True)
        return jnp.sum(outs["out"] ** 2)

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    for name in ["c1", "c2", "ds"]:
        assert np.isfinite(np.asarray(grads[name]["kernel"])).all()
        assert float(jnp.abs(grads[name]["kernel"]).sum()) > 0


def test_dilated_matmul_decomposition_matches_conv(rng):
    """Large-dilation 3x3 convs run as 9 shifted matmuls
    (graph/apply.py DILATED_MATMUL_MIN); must match the native dilated
    conv in f32."""
    import jax
    import jax.numpy as jnp
    from dcfp_tpu.graph.apply import _dilated3x3_as_matmuls

    x = jnp.asarray(rng.standard_normal((2, 33, 41, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32))
    for d in (18, 24, 36):
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _dilated3x3_as_matmuls(x, k, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_graph_conv_dispatches_large_dilation(rng):
    """A graph conv with dilation >= threshold must produce the same
    output (and gradients must flow) through the matmul path."""
    import jax
    import jax.numpy as jnp
    from dcfp_tpu.graph.apply import graph_apply, init_graph
    from dcfp_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("d")
    x = b.input("image")
    x = b.conv(x, "c", out_ch=8, kernel=3, dilation=24)
    g = b.finish([x])
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((1, 40, 48, 3)).astype(np.float32))

    out, _ = graph_apply(g, params, state, {"image": img})
    ref = jax.lax.conv_general_dilated(
        img, params["c"]["kernel"], (1, 1), ((24, 24), (24, 24)),
        rhs_dilation=(24, 24), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out["c"]), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(p):
        o, _ = graph_apply(g, p, state, {"image": img})
        return jnp.sum(o["c"] ** 2)
    grads = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(grads["c"]["kernel"])).all()
