"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.ops.pallas_kernels import resize_argmax
from dcfp_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("shape,out_hw,ac", [
    ((1, 17, 33, 19), (65, 129), True),
    ((2, 16, 16, 7), (64, 64), False),
    ((1, 9, 9, 150), (33, 33), True),
])
def test_resize_argmax_matches_xla(rng, shape, out_hw, ac):
    z = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = jnp.argmax(resize_bilinear(z, out_hw, ac), -1).astype(jnp.uint8)
    got = resize_argmax(z, out_hw, ac)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("shape,out_hw,ac", [
    ((1, 17, 33, 19), (65, 129), True),
    ((2, 16, 16, 7), (64, 64), False),
])
def test_resize_argmax_bf16_matches_xla(rng, shape, out_hw, ac):
    """bf16 logits (the deploy default): interpolation must run in f32
    and round back to bf16 before compare, bitwise-matching the unfused
    argmax(resize_bilinear(bf16)) path."""
    z = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    z = z.astype(jnp.bfloat16)
    ref = jnp.argmax(resize_bilinear(z, out_hw, ac), -1).astype(jnp.uint8)
    got = resize_argmax(z, out_hw, ac)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resize_argmax_tie_breaks_like_argmax(rng):
    """Ties resolve to the FIRST maximal channel (jnp.argmax semantics)."""
    z = np.zeros((1, 4, 4, 5), np.float32)
    z[..., 1] = 3.0
    z[..., 3] = 3.0  # tie with channel 1 -> must pick 1
    got = resize_argmax(jnp.asarray(z), (8, 8), False)
    assert (np.asarray(got) == 1).all()


def test_deploy_fused_tail_equals_unfused(rng):
    """make_inference_fn(output='argmax') must produce identical labels
    with and without the fused Pallas tail."""
    from dcfp_tpu.engine.deploy import make_inference_fn
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("m")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3, stride=2)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    x = b.conv(x, "cls", out_ch=6, kernel=1, padding=0, bias=True)
    b.resize(x, "pred", to_input=True, align_corners=True)
    g = b.finish(["pred"])
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((1, 33, 33, 3)).astype(np.float32))

    outs = {}
    for fuse in (True, False):
        fn, p = make_inference_fn(g, params, state, dtype=jnp.float32,
                                  output="argmax", fuse_tail=fuse)
        outs[fuse] = np.asarray(jax.jit(fn)(p, img))
    assert outs[True].dtype == np.uint8 and outs[True].shape == (1, 33, 33)
    np.testing.assert_array_equal(outs[True], outs[False])
