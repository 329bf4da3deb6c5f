"""Fused residual bottleneck kernel vs the unfused XLA op chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.ops.bottleneck import fused_bottleneck


def reference_chain(x, w1, b1, w2, b2, w3, b3, d):
    b1 = 0.0 if b1 is None else b1
    b2 = 0.0 if b2 is None else b2
    b3 = 0.0 if b3 is None else b3

    def conv1x1(t, w, b):
        y = jnp.einsum("hwc,co->hwo", t.astype(jnp.float32),
                       w.reshape(w.shape[-2], w.shape[-1]).astype(
                           jnp.float32))
        return (y + b).astype(t.dtype)

    t1 = jax.nn.relu(conv1x1(x, w1, b1))
    t2 = jax.lax.conv_general_dilated(
        t1[None].astype(jnp.float32), w2.astype(jnp.float32),
        window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    t2 = jax.nn.relu((t2 + b2).astype(x.dtype))
    y = conv1x1(t2, w3, b3)
    return jax.nn.relu(x.astype(jnp.float32) + y.astype(jnp.float32)
                       ).astype(x.dtype)


@pytest.mark.parametrize("h,w,cin,cm,d", [
    (13, 17, 256, 128, 2),   # h % row_tile != 0, small spatial
    (16, 33, 128, 128, 1),   # exact blocks, dilation 1
    (9, 21, 256, 128, 4),    # dilation == row tile (max supported)
])
def test_fused_bottleneck_matches_chain(rng, h, w, cin, cm, d):
    x = jnp.asarray(rng.standard_normal((h, w, cin)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cm)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * 0.05,
                     jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((1, 1, cm, cin)) * 0.05,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(cm), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(cm), jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(cin), jnp.float32)

    want = reference_chain(x, w1, b1, w2, b2, w3, b3, d)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, dilation=d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_bottleneck_bf16(rng):
    h, w, cin, cm, d = 12, 19, 256, 128, 2
    x = jnp.asarray(rng.standard_normal((h, w, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cm)) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * 0.05,
                     jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((1, 1, cm, cin)) * 0.05,
                     jnp.bfloat16)
    want = reference_chain(x, w1, None, w2, None, w3, None, d)
    got = fused_bottleneck(x, w1, None, w2, None, w3, None, dilation=d)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    # bf16 storage rounding between stages can differ by 1 ulp
    assert diff.max() <= 0.15, diff.max()
    assert (diff > 0.05).mean() < 0.01
