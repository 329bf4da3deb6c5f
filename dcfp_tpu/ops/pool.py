"""Pooling primitives (NHWC), matching torch semantics used by the models.

* max_pool: kernel/stride/symmetric padding with -inf fill
  (reference: networks/backbone/resnet.py:100 `MaxPool2d(3, 2, 1)`).
* adaptive_avg_pool: torch AdaptiveAvgPool2d bin edges
  (reference: networks/tools/ppm.py:29, networks/tools/aspp.py:56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int
             ) -> jnp.ndarray:
    """NHWC max pooling, torch-style symmetric integer padding."""
    # init value must carry the operand dtype exactly (a bare Python int
    # weak-types to int32 and reduce_window rejects int8/int32 mixes) but
    # must stay a host scalar — a jnp array would demote reduce_window to
    # the generic (non-differentiable) variadic path.
    dt = np.dtype(x.dtype)
    neg = (dt.type(-np.inf) if jnp.issubdtype(x.dtype, jnp.floating)
           else dt.type(jnp.iinfo(x.dtype).min))
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


@functools.lru_cache(maxsize=128)
def _adaptive_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix with torch adaptive bin edges:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_size, out_size).

    Expressed as two small matmuls so XLA maps it onto the MXU; exact match
    of torch AdaptiveAvgPool2d bin arithmetic.
    """
    h, w = x.shape[-3], x.shape[-2]
    compute = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(compute)
    mh = jnp.asarray(_adaptive_matrix(h, out_size), compute)
    mw = jnp.asarray(_adaptive_matrix(w, out_size), compute)
    xf = jnp.einsum("oh,...hwc->...owc", mh, xf)
    xf = jnp.einsum("ow,...hwc->...hoc", mw, xf)
    return xf.astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC global average pool, keepdims -> (N, 1, 1, C)."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True)
