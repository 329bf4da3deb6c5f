"""Pallas int8 conv+requant probe (the stated precondition of the int8
deploy dead end, engine/quantize.py docstring: "until XLA fuses int8
conv epilogues or a Pallas conv+requant kernel replaces the hot blocks,
bf16 wins").

Round-2 measurements: XLA int8 convs are 1.27x standalone but 0.54x
e2e because the int32 accumulators materialize in HBM before each
requant epilogue.  A Pallas kernel keeps the whole bottleneck chain —
conv1x1 -> requant -> conv3x3(d=2) -> requant -> conv1x1 -> dequant —
in VMEM: the int32 tensors never leave the chip, and the MXU runs int8
(2x bf16 peak on v5e: 394 TOPS vs 197 TFLOP/s).

Stages:
  A (matmul): raw MXU throughput, bf16 vs int8, one tiled Pallas matmul
     each — is int8 actually 2x on this chip?
  B (chain): the fused int8 bottleneck-chain kernel vs the identical
     bf16 XLA chain at R101-layer3 deploy shapes (129x257 spatial,
     1024/256 channels; os8 layer3 d=2 — networks/backbone/resnet.py
     dilation plan), numerics checked against a float reference of the
     quantized model.

Usage: python tools/exp_int8.py [A|B|AB] [--iters 20] [--interpret]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _common import bench, setup_compile_cache, sync  # noqa: E402

setup_compile_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# stage A: raw matmul throughput
# ---------------------------------------------------------------------------

def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
        if a_ref.dtype == jnp.int8 else jnp.float32)


def pallas_mm(a, b, tile_m=512, interpret=False):
    m, k = a.shape
    _, n = b.shape
    out_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(a, b)


MM_CHAIN = 50  # matmuls chained per dispatch: the tunnel dispatch
# floor is ~2.5 ms, far above a single 1024^3 matmul


def stage_a(iters, interpret):
    """Carried-dependency matmul chains: y <- requant(a @ y) keeps one
    dispatch busy with MM_CHAIN MXU matmuls, so the per-matmul time is
    compute, not the dispatch floor."""
    rng = np.random.default_rng(0)
    M = K = N = 1024
    flops = 2 * M * K * N
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    y8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    a16 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y16 = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    mm = functools.partial(pallas_mm, tile_m=512, interpret=interpret)

    @jax.jit
    def chain8(a, y):
        def body(_, y):
            return jnp.clip(mm(a, y) >> 7, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, MM_CHAIN, body, y)

    @jax.jit
    def chain16(a, y):
        def body(_, y):
            return (mm(a, y) * 0.03).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, MM_CHAIN, body, y)

    t8 = bench(chain8, (a8, y8), iters) / MM_CHAIN
    t16 = bench(chain16, (a16, y16), iters) / MM_CHAIN
    print(f"stage A matmul {M}x{K}x{N} (x{MM_CHAIN}/dispatch): "
          f"bf16 {t16 * 1e3:.1f} us ({flops/t16/1e9:.0f} TFLOP/s) | "
          f"int8 {t8 * 1e3:.1f} us ({flops/t8/1e9:.0f} TOP/s) | "
          f"int8 speedup {t16/t8:.2f}x")


# ---------------------------------------------------------------------------
# stage B: fused int8 bottleneck chain
# ---------------------------------------------------------------------------
# layer3 bottleneck at os8 (R101 @1025x2049): x (129, 257, 1024) ->
# 1x1 -> 256 -> 3x3 d=2 -> 256 -> 1x1 -> 1024.  Per-tensor scales;
# relu folded into the requant clamp (0..127).

D = 2  # dilation (layer3 at os8)


def _requant(acc_i32, scale, relu=True):
    y = jnp.round(acc_i32.astype(jnp.float32) * scale)
    lo = 0.0 if relu else -127.0
    return jnp.clip(y, lo, 127.0).astype(jnp.int8)


def _chain_kernel(x_hbm, w1_ref, w2_ref, w3_ref, s_ref, o_ref,
                  xt_ref, y1_ref, acc_ref, sem, *, th, w, cin, cmid):
    """One row-tile of the fused chain.  x stays in HBM; each program
    DMAs its (th + 2D)-row window (tile rows + D halo rows each side —
    overlapping windows are not expressible as BlockSpec blocks, so the
    halo read is an explicit async copy).  All intermediates (int8 y1,
    int32 accumulators) live in VMEM only."""
    i = pl.program_id(0)
    rows = th + 2 * D
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * th, rows)], xt_ref,
                               sem)
    cp.start()
    cp.wait()
    s1, s2, s3 = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2]
    # conv1 (1x1): (rows*W, Cin) @ (Cin, Cmid) -> int32 -> requant+relu
    xt = xt_ref[:].reshape(rows * w, cin)
    a1 = jax.lax.dot_general(xt, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    y1 = _requant(a1, s1).reshape(rows, w, cmid)
    y1_ref[:] = jnp.zeros_like(y1_ref)  # zero col pads (D each side)
    y1_ref[:, D:D + w, :] = y1
    # conv2 (3x3, dilation D): 9 shifted matmuls accumulate in int32.
    # Output tile row r reads y1 tile rows r + {0, D, 2D} (tile row r+D
    # is the center), cols likewise against the D-padded columns.
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for i9, dh in enumerate((0, D, 2 * D)):
        for j9, dw in enumerate((0, D, 2 * D)):
            sl = y1_ref[pl.ds(dh, th), pl.ds(dw, w), :]
            m = sl.reshape(th * w, cmid)
            acc_ref[:] += jax.lax.dot_general(
                m, w2_ref[i9 * 3 + j9], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(th, w, cmid)
    y2 = _requant(acc_ref[:].reshape(th * w, cmid), s2)
    # conv3 (1x1) + dequant to bf16
    a3 = jax.lax.dot_general(y2, w3_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    o_ref[:] = (a3.astype(jnp.float32) * s3).astype(
        jnp.bfloat16).reshape(th, w, o_ref.shape[-1])


def chain_int8(x8, w1, w2, w3, scales, th=4, interpret=False):
    """x8: (H0 + 2D, W, Cin) int8, pre-padded with D halo rows top and
    bottom (column pads are zeroed in-kernel).  Returns (H0, W, Cout)
    bf16."""
    hp, w, cin = x8.shape
    h0 = hp - 2 * D
    cmid = w1.shape[1]
    cout = w3.shape[1]
    assert h0 % th == 0, (h0, th)
    s = jnp.asarray(scales, jnp.float32).reshape(1, 3)
    return pl.pallas_call(
        functools.partial(_chain_kernel, th=th, w=w, cin=cin,
                          cmid=cmid),
        grid=(h0 // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((th, w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h0, w, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * D, w, cin), jnp.int8),
            pltpu.VMEM((th + 2 * D, w + 2 * D, cmid), jnp.int8),
            pltpu.VMEM((th, w, cmid), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x8, w1, w2, w3, s)


def chain_bf16(x, k1, k2, k3):
    """The identical chain in XLA bf16 (VALID over the halo rows so the
    output matches the kernel's h0 rows)."""
    y = jax.lax.conv_general_dilated(
        x[None], k1, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, k2, (1, 1), "SAME", rhs_dilation=(D, D),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, k3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return y[0, D:-D]


def stage_b(iters, interpret, h=128, w=256, cin=1024, cmid=256,
            cout=1024, th=4):
    rng = np.random.default_rng(1)
    hp = h + 2 * D
    x8 = jnp.asarray(rng.integers(-64, 64, (hp, w, cin)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-16, 16, (cin, cmid)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-16, 16, (9, cmid, cmid)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-16, 16, (cmid, cout)), jnp.int8)
    scales = (2e-4, 2e-4, 2e-4)

    fi = jax.jit(functools.partial(chain_int8, th=th,
                                   interpret=interpret))
    # float reference of the SAME quantized math (for numerics): run the
    # int chain in numpy at a small slice
    out_i = fi(x8, w1, w2, w3, scales)
    ref = _chain_numpy(np.asarray(x8, np.int64), np.asarray(w1, np.int64),
                       np.asarray(w2, np.int64), np.asarray(w3, np.int64),
                       scales)
    got = np.asarray(out_i, np.float32)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    print(f"stage B numerics: rel-err vs int-exact reference {err:.3e}")

    # bf16 baseline with equivalent-magnitude weights
    xb = jnp.asarray(np.asarray(x8, np.float32) * 0.01, jnp.bfloat16)
    k1 = jnp.asarray(np.asarray(w1, np.float32).reshape(1, 1, cin, cmid)
                     * 2e-2, jnp.bfloat16)
    k2 = jnp.asarray(np.transpose(np.asarray(w2, np.float32).reshape(
        3, 3, cmid, cmid), (0, 1, 2, 3)) * 2e-2, jnp.bfloat16)
    k3 = jnp.asarray(np.asarray(w3, np.float32).reshape(1, 1, cmid, cout)
                     * 2e-2, jnp.bfloat16)

    # stack BLOCKS bottlenecks per dispatch (layer3 runs 23 of them back
    # to back) so the per-block time is compute, not the ~2.5 ms tunnel
    # dispatch floor; the block output feeds the next block's input
    # (requantized for the int8 chain), like the real residual trunk.
    assert cin == cout, "block chaining feeds out back to in"
    blocks = 8

    @jax.jit
    def fi_blocks(x8, w1, w2, w3):
        def body(_, x):
            out = chain_int8(x, w1, w2, w3, scales, th=th,
                             interpret=interpret)
            nxt = jnp.clip(jnp.round(out.astype(jnp.float32) * 50.0),
                           -64, 63).astype(jnp.int8)
            return jnp.pad(nxt, ((D, D), (0, 0), (0, 0)))
        return jax.lax.fori_loop(0, blocks, body, x8)

    @jax.jit
    def fb_blocks(x, k1, k2, k3):
        def body(_, x):
            out = chain_bf16(x, k1, k2, k3)
            return jnp.pad(out, ((D, D), (0, 0), (0, 0)))
        return jax.lax.fori_loop(0, blocks, body, x)

    t_i = bench(fi_blocks, (x8, w1, w2, w3), iters) / blocks
    t_b = bench(fb_blocks, (xb, k1, k2, k3), iters) / blocks
    flops = 2 * h * w * (cin * cmid + 9 * cmid * cmid + cmid * cout)
    print(f"stage B chain {h}x{w} {cin}->{cmid}->{cout} d={D} "
          f"(x{blocks} blocks/dispatch): "
          f"bf16-XLA {t_b:.3f} ms ({flops/t_b/1e9:.0f} TFLOP/s) | "
          f"int8-pallas {t_i:.3f} ms ({flops/t_i/1e9:.0f} TOP/s) | "
          f"speedup {t_b/t_i:.2f}x")


def _chain_numpy(x, w1, w2, w3, scales):
    hp, w_, cin = x.shape
    h0 = hp - 2 * D
    a1 = x.reshape(-1, cin) @ w1
    y1 = np.clip(np.round(a1 * scales[0]), 0, 127).reshape(
        hp, w_, -1)
    cmid = y1.shape[-1]
    y1p = np.zeros((hp, w_ + 2 * D, cmid))
    y1p[:, D:D + w_] = y1
    acc = np.zeros((h0, w_, cmid))
    for i, dh in enumerate((0, D, 2 * D)):
        for j, dw in enumerate((0, D, 2 * D)):
            sl = y1p[dh:dh + h0, dw:dw + w_].reshape(-1, cmid)
            acc += (sl @ w2[i * 3 + j]).reshape(h0, w_, cmid)
    y2 = np.clip(np.round(acc * scales[1]), 0, 127)
    a3 = y2.reshape(-1, cmid) @ w3
    return (a3 * scales[2]).reshape(h0, w_, -1).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="?", default="AB")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args(argv)
    print(f"devices: {jax.devices()}")
    if "A" in args.stages:
        stage_a(args.iters, args.interpret)
    if "B" in args.stages:
        stage_b(args.iters, args.interpret)
    return 0


if __name__ == "__main__":
    sys.exit(main())
