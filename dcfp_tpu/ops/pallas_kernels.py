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
from typing import Optional

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
def _resize_argmax_cm(z_cm, out_hw, align_corners, interpret):
    c, h, w = z_cm.shape
    out_h, out_w = out_hw
    # Interp matrices always f32 (resize_bilinear computes in f32; using
    # bf16 weights would let labels near close logits diverge from the
    # unfused path).  bf16 logits stay bf16 in VMEM and are upcast
    # per-channel inside the kernel.
    wh = jnp.asarray(_interp_matrix(h, out_h, align_corners), jnp.float32)
    wwt = jnp.asarray(_interp_matrix(w, out_w, align_corners),
                      jnp.float32).T
    z_dtype = jnp.bfloat16 if z_cm.dtype == jnp.bfloat16 else jnp.float32
    z_cm = z_cm.astype(z_dtype)

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


def _resize_argmax_hwc(z, out_hw, align_corners, interpret):
    return _resize_argmax_cm(jnp.transpose(z, (2, 0, 1)), out_hw,
                             align_corners, interpret)


# 16 output rows/step: the (R, Wo, 64) out block lane-pads 64->128 and is
# double-buffered, so R=32 blows the 16MB VMEM budget at Wo=1025
_STEM_ROW_TILE = 16


def extract_stem_phases(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) image -> (4*C, Hp, Wp) stride-2 phase planes for
    :func:`stem_conv3x3_s2` (k3 s2 pad1 'same' semantics).

    Plane p = (a*2 + b)*C + c holds xpad[a::2, b::2, c] where xpad is the
    zero-padded image; every 3x3/stride-2 tap is then a UNIT-stride window
    of one plane.  Rationale: NHWC tensors with tiny C are lane-padded to
    128 on TPU (~42x physical blowup for C=3) and XLA's conv is ~0.45
    TFLOP/s on them; wide (Hp, Wp) planes restore sane layouts.  Works in
    numpy too (host-side prep for the 'phases' deploy input format).
    """
    h, w, c = image.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    # row layout is fixed to the kernel's _STEM_ROW_TILE grid: a smaller
    # tile would leave the B-carry block read out of bounds
    hp = -(-(ho + 1) // _STEM_ROW_TILE) * _STEM_ROW_TILE + 8
    wp = wo + 1
    np_mod = np if isinstance(image, np.ndarray) else jnp
    xp = np_mod.pad(image, ((1, 1), (1, 1), (0, 0)))
    planes = []
    for a in (0, 1):
        for b in (0, 1):
            for ch in range(c):
                p = xp[a::2, b::2, ch]
                planes.append(np_mod.pad(
                    p, ((0, hp - p.shape[0]), (0, wp - p.shape[1]))))
    return np_mod.stack(planes)


def _stem_kernel(a_ref, b_ref, w_ref, bias_ref, out_ref, t_ref, *,
                 cin: int, relu: bool, out_dtype):
    """One grid step = one tile of output rows.

    a_ref:   (4*cin, R, Wp)    phase-plane rows [r0, r0+R)
    b_ref:   (4*cin, 8, Wp)    phase-plane rows [r0+R, r0+R+8) (carry row)
    w_ref:   (Kp, out_ch)      taps-major kernel, rows >= 9*cin zero
    bias_ref:(1, out_ch)
    out_ref: (R, Wo, out_ch)
    t_ref:   (Kp, R, Wo)       tap-stack scratch
    """
    wo = out_ref.shape[1]
    r = out_ref.shape[0]
    # full memset: zeroing only the K-padding tail rows is an unaligned
    # 5-sublane write and measured SLOWER (2.16 vs 1.31 ms at 513x1025)
    t_ref[:] = jnp.zeros(t_ref.shape, t_ref.dtype)
    t = 0
    for i in range(3):
        for j in range(3):
            for c in range(cin):
                p = ((i & 1) * 2 + (j & 1)) * cin + c
                co = j // 2
                if i // 2 == 0:
                    t_ref[t, :, :] = a_ref[p, :, co:co + wo]
                else:  # taps one row down: last row comes from the carry
                    t_ref[t, :r - 1, :] = a_ref[p, 1:, co:co + wo]
                    t_ref[t, r - 1:, :] = b_ref[p, :1, co:co + wo]
                t += 1

    w = w_ref[:]
    bias = bias_ref[:].astype(jnp.float32)

    # static unroll: Mosaic cannot index the sublane dim dynamically
    for h in range(r):
        th = t_ref[:, h, :]  # (Kp, Wo)
        y = jax.lax.dot_general(th, w, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[h, :, :] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("cin", "out_hw", "relu",
                                             "interpret", "out_dtype"))
def _stem_conv_planes(phases, kernel_km, bias, cin, out_hw, relu,
                      interpret, out_dtype):
    ho, wo = out_hw
    n_planes, hp, wp = phases.shape
    kp = kernel_km.shape[0]
    r = _STEM_ROW_TILE
    grid = (pl.cdiv(ho, r),)
    return pl.pallas_call(
        functools.partial(_stem_kernel, cin=cin, relu=relu,
                          out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_planes, r, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_planes, 8, wp), lambda i: (0, (i + 1) * r // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kernel_km.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bias.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, wo, kernel_km.shape[1]),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, wo, kernel_km.shape[1]),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kp, r, wo), phases.dtype),
        ],
        interpret=interpret,
    )(phases, phases, kernel_km, bias)  # A-rows and B-carry views


def stem_conv3x3_s2(phases: jnp.ndarray, kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray], out_hw, *,
                    relu: bool = False, interpret: bool = None
                    ) -> jnp.ndarray:
    """3x3/stride-2/'same' conv from stride-2 phase planes (the thin
    first conv of every backbone stem, reference resnet.py:88-100).

    phases: (4*cin, Hp, Wp) from :func:`extract_stem_phases`
    kernel: (3, 3, cin, out_ch) HWIO
    out_hw: static output spatial size ((H+1)//2, (W+1)//2)
    Returns (out_hw[0], out_hw[1], out_ch) in the phases dtype.

    Numerically identical contraction order to one (9*cin)-K matmul per
    output row; f32 accumulation.  Measured v5e @1025x2049: a STANDALONE
    XLA conv on the lane-padded C=3 NHWC input runs at ~0.45 TFLOP/s
    (3.96 ms) and this kernel at 1.31 ms — but in the full deploy graph
    XLA already schedules the stem conv at ~0.8 ms, so the end-to-end
    phases path is neutral (tools/exp_deploy.py); kept for standalone /
    precomputed-phases uses.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cin, cout = kernel.shape[2], kernel.shape[3]
    k = 9 * cin
    kp = -(-k // 8) * 8
    # taps-major weight rows ordered (i, j, c) to match the kernel loop
    km = kernel.reshape(k, cout)
    km = jnp.pad(km, ((0, kp - k), (0, 0))).astype(phases.dtype)
    b = (jnp.zeros((1, cout), jnp.float32) if bias is None
         else bias.reshape(1, cout).astype(jnp.float32))
    return _stem_conv_planes(phases, km, b, cin,
                             (int(out_hw[0]), int(out_hw[1])), bool(relu),
                             bool(interpret), phases.dtype)


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


def resize_argmax_cm(logits_cm: jnp.ndarray, out_hw,
                     align_corners: bool = False,
                     interpret: bool = None) -> jnp.ndarray:
    """Channel-major variant: logits_cm (N, C, h, w) -> (N, out_h, out_w)
    uint8.  Same numerics as :func:`resize_argmax`, for callers that
    already hold channel-major logits (skips the NHWC->CHW transpose).

    NOTE this is NOT a layout firewall: producing the (C, h, w) operand
    inside a conv-bearing program (via transpose, dot_general, or even a
    dedicated Pallas classifier kernel) lets XLA's conv-strategy /
    layout passes degrade the upstream convs ~2.5x.  The deploy path
    instead isolates the Pallas tail in its OWN executable
    (deploy.make_split_inference_fn) — see docs/ROADMAP.md."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    outs = [_resize_argmax_cm(logits_cm[n], out_hw, bool(align_corners),
                              bool(interpret))
            for n in range(logits_cm.shape[0])]
    return jnp.stack(outs)
