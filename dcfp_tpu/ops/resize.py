"""Bilinear resize as two small matmuls (MXU-friendly).

Separable bilinear interpolation: out = W_h @ x @ W_w^T per channel.  The
interpolation weight matrices are tiny, computed at trace time with numpy
(shapes are static under jit), and the contraction runs on the MXU instead
of a gather — which is the fast path on TPU for the large upsample at the
end of every segmentation head (reference: networks/deeplabv3.py:47
`F.interpolate(..., mode='bilinear', align_corners=...)`).

Supports both align_corners conventions of torch:
  * align_corners=False — half-pixel centers (matches `jax.image.resize`)
  * align_corners=True  — endpoints pinned, src = dst * (in-1)/(out-1)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool,
                   dtype: str = "float32") -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=dtype)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros((1,), dtype=np.float64)
    else:
        # half-pixel centers, clamped (torch align_corners=False semantics)
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat.astype(dtype)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False
                    ) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / NCHW-free) arrays on H, W axes.

    x: (..., H, W, C).  Returns (..., out_h, out_w, C) in x.dtype.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    compute = jnp.promote_types(dtype, jnp.float32)
    xf = x.astype(compute)
    if h != out_h:
        wh = jnp.asarray(_interp_matrix(h, out_h, align_corners), compute)
        xf = jnp.einsum("oh,...hwc->...owc", wh, xf)
    if w != out_w:
        ww = jnp.asarray(_interp_matrix(w, out_w, align_corners), compute)
        xf = jnp.einsum("ow,...hwc->...hoc", ww, xf)
    return xf.astype(dtype)


def resize_bilinear_cf(x: jnp.ndarray, out_hw, align_corners: bool = False
                       ) -> jnp.ndarray:
    """Channels-first bilinear resize: x is (..., C, H, W) and W stays the
    minor (lane) axis throughout.

    Same interpolation matrices (and numerics) as :func:`resize_bilinear`;
    this variant exists because thin-channel NHWC tensors lane-pad C to
    128 on TPU (a 6.7x physical blowup for 19-class logits), which made
    the full-resolution loss towers of the train step HBM-bound.  Keeping
    the spatial W axis minor costs only the 128-multiple padding of W.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    compute = jnp.promote_types(dtype, jnp.float32)
    xf = x.astype(compute)
    if h != out_h:
        wh = jnp.asarray(_interp_matrix(h, out_h, align_corners), compute)
        xf = jnp.einsum("oh,...hw->...ow", wh, xf)
    if w != out_w:
        ww = jnp.asarray(_interp_matrix(w, out_w, align_corners), compute)
        xf = jnp.einsum("ow,...hw->...ho", ww, xf)
    return xf.astype(dtype)
