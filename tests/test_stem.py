"""Fast stem paths: the Pallas phase-plane kernel, the NCHW
decimation-matmul conv, and their integration into make_inference_fn.

Exactness bar: both paths must match XLA's native conv bit-for-bit in
f32 (same tap sum order up to f32 accumulation; tolerance 0 observed,
asserted at 1e-5 for safety across backends).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.ops.pallas_kernels import extract_stem_phases, stem_conv3x3_s2
from dcfp_tpu.ops.stem import conv3x3_s2_nchw, stem_plan


def native(x_nhwc, k):
    return jax.lax.conv_general_dilated(
        x_nhwc, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,cin,cout", [(65, 129, 3, 64), (64, 64, 3, 16),
                                          (33, 47, 4, 8)])
def test_stem_kernel_matches_native_conv(rng, h, w, cin, cout):
    x = rng.standard_normal((h, w, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    ref = np.asarray(native(jnp.asarray(x)[None], jnp.asarray(k))[0] + b)

    ph = extract_stem_phases(jnp.asarray(x))
    out = stem_conv3x3_s2(ph, jnp.asarray(k), jnp.asarray(b),
                          ((h + 1) // 2, (w + 1) // 2))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    out_r = stem_conv3x3_s2(ph, jnp.asarray(k), jnp.asarray(b),
                            ((h + 1) // 2, (w + 1) // 2), relu=True)
    np.testing.assert_allclose(np.asarray(out_r), np.maximum(ref, 0),
                               atol=1e-5)

    # host (numpy) and device phase extraction agree exactly
    assert np.array_equal(extract_stem_phases(x), np.asarray(ph))


@pytest.mark.parametrize("h,w,cin,cout", [(65, 129, 3, 64), (33, 47, 4, 8)])
def test_nchw_decimation_conv_matches_native(rng, h, w, cin, cout):
    x = rng.standard_normal((h, w, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    ref = np.asarray(native(jnp.asarray(x)[None], jnp.asarray(k))[0] + b)
    out = conv3x3_s2_nchw(jnp.asarray(np.transpose(x, (2, 0, 1))),
                          jnp.asarray(k), jnp.asarray(b),
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def _fcn(num_classes=7):
    from dcfp_tpu.models.registry import build_model
    return build_model("simple", backbone="resnet50",
                       backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                      "inplanes": 128},
                       num_classes=num_classes, align_corner=False,
                       deepsup=False)


def test_stem_plan_finds_resnet_stem():
    model = _fcn()
    plan = stem_plan(model.graph)
    assert plan is not None
    inp, conv = plan
    assert inp == "image"
    assert model.graph.node(conv).attrs["in_ch"] == 3


def test_inference_fn_input_formats_agree(rng):
    """make_inference_fn output is identical (argmax labels) across the
    nhwc / nchw / phases input formats on the same image."""
    from dcfp_tpu.engine.deploy import make_inference_fn
    from dcfp_tpu.graph.apply import init_graph

    model = _fcn()
    params, state = init_graph(model.graph, jax.random.key(0))
    img = rng.standard_normal((1, 65, 97, 3)).astype(np.float32)

    fn0, p0 = make_inference_fn(model.graph, params, state,
                                dtype=jnp.float32, output="argmax")
    ref = np.asarray(jax.jit(fn0)(p0, jnp.asarray(img)))

    fn1, p1 = make_inference_fn(model.graph, params, state,
                                dtype=jnp.float32, output="argmax",
                                input_format="nchw")
    got1 = np.asarray(jax.jit(fn1)(p1, jnp.asarray(
        np.transpose(img, (0, 3, 1, 2)))))
    assert np.array_equal(got1, ref)

    phases = np.stack([extract_stem_phases(img[0])])
    fn2, p2 = make_inference_fn(model.graph, params, state,
                                dtype=jnp.float32, output="argmax",
                                input_format="phases", input_hw=(65, 97))
    got2 = np.asarray(jax.jit(fn2)(p2, jnp.asarray(phases)))
    assert np.array_equal(got2, ref)


def test_inference_fn_phases_requires_input_hw():
    from dcfp_tpu.engine.deploy import make_inference_fn
    from dcfp_tpu.graph.apply import init_graph
    model = _fcn()
    params, state = init_graph(model.graph, jax.random.key(0))
    with pytest.raises(ValueError, match="input_hw"):
        make_inference_fn(model.graph, params, state,
                          input_format="phases")
