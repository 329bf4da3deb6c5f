"""Pallas TPU kernels for memory-bound hot ops.

``resize_argmax``: fused bilinear-upsample + channel argmax for the
deploy path (reference totrt.py runs TRT fp16 then argmaxes on host).
The XLA pipeline materializes the upsampled logits (1025x2049x19 f32
~ 150 MB written + read back by argmax); this kernel keeps the low-res
logits + interpolation matrices in VMEM and emits only the uint8 label
map:

  out[y, x] = argmax_c  sum_ij  Wh[y, i] * Ww[x, j] * z[c, i, j]

computed per output-row tile as two MXU matmuls per channel with a
running (max, argmax) in VMEM.  Ties resolve to the first maximal
channel, matching ``jnp.argmax`` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcfp_tpu.ops.resize import _interp_matrix

_ROW_TILE = 32


def _kernel(z_ref, wh_ref, wwt_ref, out_ref, val_ref, idx_ref):
    """One grid step = one tile of output rows.

    z_ref:   (C, h, w)       low-res logits, channel-major
    wh_ref:  (TR, h)         H-interp rows for this tile
    wwt_ref: (w, W)          W-interp, transposed
    out_ref: (TR, W) uint8   argmax labels
    val/idx: (TR, W) f32/i32 running max scratch
    """
    n_ch = z_ref.shape[0]
    val_ref[:] = jnp.full(val_ref.shape, -jnp.inf, jnp.float32)
    idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)
    wh = wh_ref[:]
    wwt = wwt_ref[:]
    for c in range(n_ch):  # static unroll; C ~ 19..171
        zh = jnp.dot(wh, z_ref[c], preferred_element_type=jnp.float32)
        out_c = jnp.dot(zh.astype(wwt.dtype), wwt,
                        preferred_element_type=jnp.float32)
        better = out_c > val_ref[:]
        val_ref[:] = jnp.where(better, out_c, val_ref[:])
        idx_ref[:] = jnp.where(better, c, idx_ref[:])
    out_ref[:] = idx_ref[:].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_hw", "align_corners",
                                             "interpret"))
def _resize_argmax_hwc(z, out_hw, align_corners, interpret):
    h, w, c = z.shape
    out_h, out_w = out_hw
    dtype = jnp.bfloat16 if z.dtype == jnp.bfloat16 else jnp.float32
    wh = jnp.asarray(_interp_matrix(h, out_h, align_corners), dtype)
    wwt = jnp.asarray(_interp_matrix(w, out_w, align_corners), dtype).T
    z_cm = jnp.transpose(z, (2, 0, 1)).astype(dtype)  # (C, h, w)

    grid = (pl.cdiv(out_h, _ROW_TILE),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_h, out_w), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((_ROW_TILE, out_w), jnp.float32),
            pltpu.VMEM((_ROW_TILE, out_w), jnp.int32),
        ],
        interpret=interpret,
    )(z_cm, wh, wwt)


def resize_argmax(logits: jnp.ndarray, out_hw, align_corners: bool = False,
                  interpret: bool = None) -> jnp.ndarray:
    """argmax_c(bilinear_resize(logits, out_hw)) without materializing the
    upsampled logits.  logits: (N, h, w, C) -> (N, out_h, out_w) uint8.

    Exactly equivalent to
    ``jnp.argmax(resize_bilinear(logits, out_hw, align), -1)`` (same
    interpolation matrices, f32 accumulation, first-max tie-breaking).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    outs = [_resize_argmax_hwc(logits[n], out_hw, bool(align_corners),
                               bool(interpret))
            for n in range(logits.shape[0])]
    return jnp.stack(outs)
