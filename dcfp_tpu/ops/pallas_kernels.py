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


def _kernel(z_ref, wh_ref, wwt_ref, out_ref, val_ref, idx_ref, *,
            round_dtype):
    """One grid step = one tile of output rows.

    z_ref:   (C, h, w)       low-res logits, channel-major
    wh_ref:  (TR, h)         H-interp rows for this tile
    wwt_ref: (w, W)          W-interp, transposed
    out_ref: (TR, W) uint8   argmax labels
    val/idx: (TR, W) f32/i32 running max scratch
    round_dtype: static — the logits dtype; the f32-interpolated value
      is rounded back to it before the max compare, so labels are
      bitwise-identical to argmax(resize_bilinear(z)) which returns
      the resized logits in z.dtype.
    """
    n_ch = z_ref.shape[0]
    val_ref[:] = jnp.full(val_ref.shape, -jnp.inf, jnp.float32)
    idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)
    wh = wh_ref[:]
    wwt = wwt_ref[:]
    for c in range(n_ch):  # static unroll; C ~ 19..171
        # Interpolation runs in f32 even for bf16 logits (only the
        # resident z tile stays bf16): resize_bilinear promotes to f32,
        # and matching it keeps the exactness claim below honest.
        zh = jnp.dot(wh, z_ref[c].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        out_c = jnp.dot(zh, wwt, preferred_element_type=jnp.float32)
        if round_dtype != jnp.float32:
            out_c = out_c.astype(round_dtype).astype(jnp.float32)
        better = out_c > val_ref[:]
        val_ref[:] = jnp.where(better, out_c, val_ref[:])
        idx_ref[:] = jnp.where(better, c, idx_ref[:])
    out_ref[:] = idx_ref[:].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_hw", "align_corners",
                                             "interpret"))
def _resize_argmax_hwc(z, out_hw, align_corners, interpret):
    h, w, c = z.shape
    out_h, out_w = out_hw
    # Interp matrices always f32 (resize_bilinear computes in f32; using
    # bf16 weights would let labels near close logits diverge from the
    # unfused path).  bf16 logits stay bf16 in VMEM and are upcast
    # per-channel inside the kernel.
    wh = jnp.asarray(_interp_matrix(h, out_h, align_corners), jnp.float32)
    wwt = jnp.asarray(_interp_matrix(w, out_w, align_corners),
                      jnp.float32).T
    z_dtype = jnp.bfloat16 if z.dtype == jnp.bfloat16 else jnp.float32
    z_cm = jnp.transpose(z, (2, 0, 1)).astype(z_dtype)  # (C, h, w)

    grid = (pl.cdiv(out_h, _ROW_TILE),)
    return pl.pallas_call(
        functools.partial(_kernel, round_dtype=z_dtype),
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
    ``jnp.argmax(resize_bilinear(logits, out_hw, align), -1)`` for f32
    *and* bf16 logits: same interpolation matrices, f32 accumulation,
    values rounded back to the logits dtype before comparison (matching
    resize_bilinear's output dtype), first-max tie-breaking.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    outs = [_resize_argmax_hwc(logits[n], out_hw, bool(align_corners),
                               bool(interpret))
            for n in range(logits.shape[0])]
    return jnp.stack(outs)
