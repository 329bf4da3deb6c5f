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


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_resize_argmax_cm_matches_hwc(rng, dtype):
    """The channel-major entry (deploy's layout-safe path) must produce
    the same labels as the NHWC entry."""
    from dcfp_tpu.ops.pallas_kernels import resize_argmax_cm
    z = jnp.asarray(rng.standard_normal((2, 11, 17, 19))
                    .astype(np.float32)).astype(dtype)
    ref = resize_argmax(z, (33, 65), True)
    got = resize_argmax_cm(jnp.transpose(z, (0, 3, 1, 2)), (33, 65), True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resize_argmax_tie_breaks_like_argmax(rng):
    """Ties resolve to the FIRST maximal channel (jnp.argmax semantics)."""
    z = np.zeros((1, 4, 4, 5), np.float32)
    z[..., 1] = 3.0
    z[..., 3] = 3.0  # tie with channel 1 -> must pick 1
    got = resize_argmax(jnp.asarray(z), (8, 8), False)
    assert (np.asarray(got) == 1).all()


def _tail_graph(with_relu_tail: bool):
    from dcfp_tpu.graph.ir import GraphBuilder
    b = GraphBuilder("m")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3, stride=2)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    x = b.conv(x, "cls", out_ch=6, kernel=1, padding=0, bias=True)
    if with_relu_tail:
        x = b.relu(x, "r2")  # non-conv logits producer
    b.resize(x, "pred", to_input=True, align_corners=True)
    return b.finish(["pred"])


@pytest.mark.parametrize("batch,relu_tail", [(1, False), (2, False),
                                             (1, True)])
def test_deploy_fused_tail_equals_unfused(rng, batch, relu_tail):
    """make_inference_fn(output='argmax') must produce identical labels
    with and without the fused Pallas tail."""
    from dcfp_tpu.engine.deploy import make_inference_fn
    from dcfp_tpu.graph.apply import init_graph

    g = _tail_graph(relu_tail)
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((batch, 33, 33, 3))
                      .astype(np.float32))

    outs = {}
    for fuse in (True, False):
        fn, p = make_inference_fn(g, params, state, dtype=jnp.float32,
                                  output="argmax", fuse_tail=fuse)
        outs[fuse] = np.asarray(jax.jit(fn)(p, img))
    assert outs[True].dtype == np.uint8
    assert outs[True].shape == (batch, 33, 33)
    np.testing.assert_array_equal(outs[True], outs[False])


def test_deploy_split_matches_single_program(rng):
    """aot_compile_split (body + Pallas tail as separate executables —
    the deploy default) must produce the single-program labels."""
    from dcfp_tpu.engine.deploy import (aot_compile, aot_compile_split,
                                        make_inference_fn,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph

    g = _tail_graph(False)
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((1, 33, 33, 3))
                      .astype(np.float32))

    fn, p = make_inference_fn(g, params, state, dtype=jnp.float32,
                              output="argmax")
    single = np.asarray(aot_compile(fn, p, img.shape)(p, img))

    body, tail, p2 = make_split_inference_fn(g, params, state,
                                             dtype=jnp.float32,
                                             output="argmax")
    assert tail is not None
    run = aot_compile_split(body, tail, p2, img.shape)
    split = np.asarray(run(p2, img))
    assert split.dtype == np.uint8 and split.shape == (1, 33, 33)
    # identical on CPU; on TPU the split body may pick a different
    # (tiled) conv strategy with different bf16 rounding — here both
    # run f32 on the test platform so labels must match exactly
    np.testing.assert_array_equal(split, single)


def test_serialized_split_roundtrip(rng, tmp_path):
    """export_serialized_split + load_serialized must reproduce the
    chained body+tail labels."""
    from dcfp_tpu.engine.deploy import (export_serialized_split,
                                        load_serialized,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph

    g = _tail_graph(False)
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((1, 17, 21, 3))
                      .astype(np.float32))
    body, tail, p = make_split_inference_fn(g, params, state,
                                            dtype=jnp.float32,
                                            output="argmax")
    path = str(tmp_path / "model.stablehlo")
    export_serialized_split(body, tail, p, img.shape, path)
    import os
    assert os.path.isfile(path) and os.path.isfile(path + ".tail")
    run = load_serialized(path)
    got = np.asarray(run(p, img))
    want = np.asarray(jax.jit(
        lambda pp, im: tail(body(pp, im), (17, 21)))(p, img))
    np.testing.assert_array_equal(got, want)


def test_deploy_autotune_picks_a_mode(rng):
    """aot_compile_best times split vs single-program and returns the
    winner; either way the labels must match the split reference (on
    CPU both forms are numerically identical)."""
    from dcfp_tpu.engine.deploy import (aot_compile_best,
                                        aot_compile_split,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph

    g = _tail_graph(False)
    params, state = init_graph(g, jax.random.key(0))
    img = jnp.asarray(rng.standard_normal((1, 33, 33, 3))
                      .astype(np.float32))
    body, tail, p = make_split_inference_fn(g, params, state,
                                            dtype=jnp.float32,
                                            output="argmax")
    run, mode = aot_compile_best(body, tail, p, img.shape, sample=img,
                                 probe_iters=2)
    assert mode in ("split", "single")
    want = np.asarray(aot_compile_split(body, tail, p, img.shape)(p, img))
    np.testing.assert_array_equal(np.asarray(run(p, img)), want)

    # no tail (logits output) degrades to the body program
    body2, tail2, p2 = make_split_inference_fn(g, params, state,
                                               dtype=jnp.float32,
                                               output="logits")
    run2, mode2 = aot_compile_best(body2, tail2, p2, img.shape,
                                   sample=img)
    assert tail2 is None and mode2 == "split"
    assert run2(p2, img).shape[0] == 1


def test_stale_split_tail_removed_on_reexport(rng, tmp_path):
    """Re-exporting into the same save path with a tail-less form must
    remove the previous split's .tail — load_serialized would otherwise
    chain the stale tail onto the new body."""
    import os
    from dcfp_tpu.engine.deploy import (export_serialized_split,
                                        load_serialized,
                                        make_split_inference_fn)
    from dcfp_tpu.graph.apply import init_graph

    g = _tail_graph(False)
    params, state = init_graph(g, jax.random.key(0))
    path = str(tmp_path / "model.stablehlo")
    img = jnp.asarray(rng.standard_normal((1, 17, 21, 3))
                      .astype(np.float32))

    body_a, tail_a, p = make_split_inference_fn(g, params, state,
                                                dtype=jnp.float32,
                                                output="argmax")
    export_serialized_split(body_a, tail_a, p, img.shape, path)
    assert os.path.isfile(path + ".tail")

    # re-export as a logits engine (no tail) into the same path
    body_l, tail_l, p2 = make_split_inference_fn(g, params, state,
                                                 dtype=jnp.float32,
                                                 output="logits")
    assert tail_l is None
    export_serialized_split(body_l, tail_l, p2, img.shape, path)
    assert not os.path.exists(path + ".tail")
    out = load_serialized(path)(p2, img)
    assert out.ndim == 4  # logits, not labels through a stale tail
