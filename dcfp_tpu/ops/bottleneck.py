"""Fused residual bottleneck kernel — a MEASURED DEAD END, kept as the
record (tools/exp_bottleneck.py reproduces the numbers).

One Pallas kernel computes a full BN-folded ResNet bottleneck

    y = relu(x + (relu(relu(x @ W1 + b1) *conv3x3,d* W2 + b2)) @ W3 + b3)

keeping both quarter-width intermediates in VMEM.  Motivation (measured,
v5e, pruned R101 deploy @1025x2049 — tools/exp_suffix.py): layer3 is 23
such blocks at (129, 257, 1024->128->128->1024, d=2) costing 6.25 ms;
the unfused chain writes/reads the 68 MB trunk activation plus both
intermediates between every op.  Roofline for the fused block is
max(read x + write y ~= 0.17 ms, 27 GFLOP on the MXU ~= 0.14 ms).

**Verdict (2026-08, v5e):** XLA's in-graph schedule runs the block at
~0.27 ms (~100 TFLOP/s) — better than both kernel variants tried:
(a) per-image-row matmuls (M=257): 0.53 ms, 51 TFLOP/s — M too small;
(b) this flat-layout version (M=1048 per tap matmul): 1.42 ms,
19 TFLOP/s — every dilated tap is an unaligned sublane window of the
t1 ring, and the resulting vector relayouts dwarf the matmuls.
XLA hides the inter-op HBM traffic behind the MXU well enough that the
theoretical ~0.1 ms/block of headroom is not reachable this way; the
module stays as correct, tested documentation of the attempt.

Layout: the image is stored FLAT — W zero-padded by the dilation on both
sides (Wp = W + 2d) and (H, Wp, C) collapsed to (H*Wp, C) — so every tap
of the dilated 3x3 is a static sublane shift of the flat row axis
(shift = di*Wp + dj) and every matmul runs at M = rows_per_block*Wp
instead of per-image-row M = W.  A first version with per-row matmuls
ran at 51 TFLOP/s; this layout exists because of that measurement.
Margins stay zero through the block (t1 and y are masked), so chained
blocks — all 22 interior layer3 bottlenecks — stay in flat layout with
pad/flatten only at entry and exit (see :func:`to_flat`, :func:`from_flat`).

Structure: a software pipeline over the (sequential) TPU grid.  Step i
computes t1 = relu(x @ W1 + b1) for flat-row block i into a 3-slot VMEM
ring; with blocks i-2..i live it emits output block i-1 — the largest
tap shift (d*Wp + d) is less than one block, so all taps of block i-1
are resident.  The residual x comes from a 2-slot VMEM ring filled the
step before; HBM traffic is exactly one read of x and one write of y.
Reference semantics: resnet.py:20-58 (Bottleneck forward), BN pre-folded
by engine/deploy.fold_batchnorm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# image rows per grid step; block = row_tile * Wp flat rows.  4 keeps
# the x/out double buffers + x ring + t1 ring + weights under 16 MB VMEM
# at (257, 1024, 128); larger dilations need proportionally taller
# blocks so every tap shift stays within one block.
_ROW_TILE = 4


def row_tile(d: int) -> int:
    return max(_ROW_TILE, d + 1)


def flat_wp(w: int, d: int) -> int:
    """Padded width: >= w + 2d, rounded up until a block (row_tile(d)
    image rows) is a multiple of 8 flat rows (TPU sublane tiling)."""
    wp = w + 2 * d
    while (row_tile(d) * wp) % 8:
        wp += 1
    return wp


def to_flat(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(H, W, C) -> (Hp*Wp, C) flat layout: W zero-padded by d on the
    left (plus alignment slack on the right), H zero-padded up to a
    row_tile(d) multiple."""
    h, w, c = x.shape
    hp = pl.cdiv(h, row_tile(d)) * row_tile(d)
    wp = flat_wp(w, d)
    xp = jnp.pad(x, ((0, hp - h), (d, wp - d - w), (0, 0)))
    return xp.reshape(hp * wp, c)


def from_flat(xf: jnp.ndarray, h: int, w: int, d: int) -> jnp.ndarray:
    """Inverse of :func:`to_flat`."""
    wp = flat_wp(w, d)
    return xf.reshape(-1, wp, xf.shape[-1])[:h, d:d + w, :]


def _window(ring, s_prev, s_cur, s_next, shift: int, rows: int):
    """Flat-row window [shift, shift+rows) of block j from a 3-slot ring
    (slots = blocks j-1, j, j+1); shift is static, |shift| < rows."""
    if shift == 0:
        return ring[s_cur]
    if shift < 0:
        a = ring[s_prev, rows + shift:]
        b = ring[s_cur, :rows + shift]
    else:
        a = ring[s_cur, shift:]
        b = ring[s_next, :shift]
    return jax.lax.concatenate([a, b], 0)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, t1_ring, x_ring, *, d: int, w: int, wp: int, h: int,
            tile: int, out_dtype):
    """Grid step i: phase 1 computes t1(block i); phase 2 emits y(block
    i-1).  The grid has one extra trailing step to drain the pipeline."""
    i = pl.program_id(0)
    steps = pl.num_programs(0)
    rows = out_ref.shape[0]

    def mask(block):
        """(rows, 1) validity of this block's flat positions: 1 inside
        the W margins and above image row h, else 0.  A block spans
        exactly _ROW_TILE whole image rows, so the column pattern is
        block-independent."""
        l = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        col_ok = (l % wp >= d) & (l % wp < d + w)
        row_ok = block * tile + l // wp < h
        return (col_ok & row_ok).astype(jnp.float32)

    @pl.when(i < steps - 1)
    def _phase1():
        slot = jax.lax.rem(i, 3)
        x_ring[jax.lax.rem(i, 2)] = x_ref[:]
        y = jax.lax.dot_general(
            x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b1_ref[:].astype(jnp.float32), 0.0)
        # zero the W margins (they are read as column taps of valid
        # pixels) and rows past H
        y = y * mask(i)
        t1_ring[slot] = y.astype(t1_ring.dtype)

    @pl.when(i > 0)
    def _phase2():
        j = i - 1
        # rem(j-1, 3) is -1 at j=0 (C semantics) and lax.select still
        # evaluates the untaken load -> use the wrapped equivalent j+2
        s_prev, s_cur, s_next = (jax.lax.rem(j + 2, 3),
                                 jax.lax.rem(j, 3), jax.lax.rem(j + 1, 3))
        zeros_blk = jnp.zeros(t1_ring.shape[1:], t1_ring.dtype)
        acc = jnp.zeros((rows, w2_ref.shape[2]), jnp.float32)
        for ki in range(3):
            for kj in range(3):
                shift = (ki - 1) * d * wp + (kj - 1) * d
                tap = _window(t1_ring, s_prev, s_cur, s_next, shift, rows)
                if shift < 0:
                    tap = jnp.where(j > 0, tap, jax.lax.concatenate(
                        [zeros_blk[rows + shift:], tap[-shift:]], 0))
                elif shift > 0:
                    tap = jnp.where(i < steps - 1, tap,
                                    jax.lax.concatenate(
                                        [tap[:rows - shift],
                                         zeros_blk[:shift]], 0))
                acc += jax.lax.dot_general(
                    tap, w2_ref[ki * 3 + kj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        t2 = jnp.maximum(acc + b2_ref[:].astype(jnp.float32), 0.0)
        y = jax.lax.dot_general(
            t2.astype(t1_ring.dtype), w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        y = y + x_ring[jax.lax.rem(j, 2)].astype(jnp.float32)
        y = jnp.maximum(y, 0.0) * mask(j)
        out_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "d", "interpret"))
def flat_bottleneck(xf, w1, b1, w2k, b2, w3, b3, h, w, d,
                    interpret=False):
    """One fused bottleneck on a flat-layout image (see :func:`to_flat`).

    xf: (Hp*Wp, cin); returns the same shape/layout (margins zeroed), so
    calls chain without leaving the flat layout."""
    wp = flat_wp(w, d)
    cin, cm = w1.shape
    tile = row_tile(d)
    rows = tile * wp
    blocks = xf.shape[0] // rows
    if d * wp + d >= rows:
        raise ValueError("tap shift exceeds one block")

    grid = (blocks + 1,)
    return pl.pallas_call(
        functools.partial(_kernel, d=d, w=w, wp=wp, h=h, tile=tile,
                          out_dtype=xf.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, cin),
                         lambda i, nb=blocks: (jnp.minimum(i, nb - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cm, cm), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cm, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cin),
                               lambda i: (jnp.maximum(i - 1, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, rows, cm), xf.dtype),
            pltpu.VMEM((2, rows, cin), xf.dtype),
        ],
        interpret=interpret,
    )(xf, w1, b1, w2k, b2, w3, b3)


def _prep(x_dtype, w1, b1, w2, b2, w3, b3):
    w1 = w1.reshape(w1.shape[-2], w1.shape[-1]).astype(x_dtype)
    w3 = w3.reshape(w3.shape[-2], w3.shape[-1]).astype(x_dtype)
    cm, cin = w3.shape
    w2k = w2.reshape(9, cm, cm).astype(x_dtype)

    def pb(b, n):
        if b is None:
            return jnp.zeros((1, n), jnp.float32)
        return b.reshape(1, n).astype(jnp.float32)

    return w1, pb(b1, cm), w2k, pb(b2, cm), w3, pb(b3, cin)


def fused_bottleneck(x: jnp.ndarray, w1, b1, w2, b2, w3, b3, *,
                     dilation: int = 2, interpret: bool = None
                     ) -> jnp.ndarray:
    """y = relu(x + conv1x1(relu(conv3x3_d(relu(conv1x1(x))))))
    for one (H, W, Cin) image; weights HWIO-style, biases per-channel
    (BN already folded).

    w1: (1, 1, cin, cm) or (cin, cm);  w2: (3, 3, cm, cm);
    w3: (1, 1, cm, cin) or (cm, cin).  Chained calls should use
    :func:`to_flat` / :func:`flat_bottleneck` / :func:`from_flat`
    directly to pay the layout conversion once.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w, _ = x.shape
    w1, b1, w2k, b2, w3, b3 = _prep(x.dtype, w1, b1, w2, b2, w3, b3)
    xf = to_flat(x, dilation)
    yf = flat_bottleneck(xf, w1, b1, w2k, b2, w3, b3, h, w,
                         int(dilation), bool(interpret))
    return from_flat(yf, h, w, dilation)
