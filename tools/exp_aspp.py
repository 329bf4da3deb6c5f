"""Pallas fused ASPP dilated-branch probe (round-4 VERDICT item 5).

The pruned-R101 deploy roofline names ASPP as the one segment with real
headroom (measured 6.23 ms vs fused SOL 2.96; everything else is at or
near SOL).  XProf per-op attribution (tools/exp_xprof.py deploy_pruned)
shows the segment's time spread across ~1 ms conv fusions plus a 15.6 ms
async weight-prefetch window for the bf16[3,3,2048,128] branch weights —
no single hot op, so the gap is conv *strategy*: the three 3x3 dilated
branches (d=12/24/36 at os8, reference networks/tools/aspp.py:40-46)
each re-read the same 136 MB input from HBM and run ~47% MXU.

The untried candidate fix: ONE Pallas kernel that reads each input tile
once and computes all three dilated branches from VMEM — shifted-matmul
taps like the int8 chain kernel (tools/exp_int8.py), bf16 MXU with f32
accumulators carried across channel chunks.

Stages:
  N: numerics — kernel vs XLA's three dilated convs (f32-accum bf16).
  B: benchmark at the pruned deploy shape (129x257x2048 -> 3x128),
     carried-dependency chained dispatches.

MEASURED VERDICT (v5e chip, 2026-08-19; see docs/ROADMAP.md): XLA runs
the three branches in 3.53-3.61 ms (130-133 TFLOP/s, ~66% MXU).  The
per-tap kernel: 32.4 ms (0.11x) — dispatch-overhead-bound small
matmuls.  The tap-concat kernel (--kconcat): 10.6 ms (0.33x).  Closed
as a measured dead end: the halo-window DMA amplification
((th+2*36)/th) plus unaligned shift relayouts exceed the <=1.5x-of-SOL
margin XLA leaves on the table.

Usage: python tools/exp_aspp.py [NB] [--iters 10] [--kconcat]
       [--th N] [--cc N] [--interpret]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _common import bench as _bench, setup_compile_cache, sync  # noqa: E402,F401

setup_compile_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (12, 24, 36)  # os8 ASPP (reference aspp.py:40-46)
DMAX = max(DILATIONS)

# fewer warmups than the shared default: a Mosaic compile of the fused
# kernel is minutes, and 3 suffices once the executable is cached
bench = functools.partial(_bench, warmup=3)


def _aspp_kernel(xp_hbm, w_ref, o_ref, xt_ref, acc_ref, sem, *,
                 th, w_out, cc, cout, n_cc):
    """One (row-tile, channel-chunk) step: DMA the (th + 2*DMAX)-row,
    channel-chunk-wide window of the padded input, then for each branch
    and each of its 9 taps run one shifted [th*w, cc] @ [cc, cout]
    matmul into the branch's f32 accumulator.  Accumulators persist
    across the channel-chunk grid dim; the last chunk applies ReLU and
    writes bf16."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = th + 2 * DMAX
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * th, rows), :, pl.ds(j * cc, cc)], xt_ref, sem)
    cp.start()

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cp.wait()
    for b, d in enumerate(DILATIONS):
        for ky in range(3):
            for kx in range(3):
                a = xt_ref[pl.ds(DMAX + (ky - 1) * d, th),
                           pl.ds(DMAX + (kx - 1) * d, w_out), :]
                acc_ref[:, :, pl.ds(b * cout, cout)] += jax.lax.dot_general(
                    a.reshape(th * w_out, cc), w_ref[b * 9 + ky * 3 + kx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(th, w_out, cout)

    @pl.when(j == n_cc - 1)
    def _():
        o_ref[:] = jnp.maximum(acc_ref[:], 0.0).astype(jnp.bfloat16)


def _aspp_kernel_kconcat(xp_hbm, w_ref, o_ref, xt_ref, a_ref, acc_ref,
                         sem, *, th, w_out, cc, cout, n_cc):
    """Variant: fold the 9 taps into the contraction — per branch and
    channel chunk, build A' = concat_tap(shifted x) in VMEM (VPU copies)
    and run ONE [th*w, 9*cc] @ [9*cc, cout] matmul, 9x fewer MXU
    dispatches than the per-tap variant."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = th + 2 * DMAX
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * th, rows), :, pl.ds(j * cc, cc)], xt_ref, sem)
    cp.start()

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cp.wait()
    for b, d in enumerate(DILATIONS):
        for t in range(9):
            ky, kx = t // 3, t % 3
            a_ref[:, :, pl.ds(t * cc, cc)] = xt_ref[
                pl.ds(DMAX + (ky - 1) * d, th),
                pl.ds(DMAX + (kx - 1) * d, w_out), :]
        acc_ref[:, :, pl.ds(b * cout, cout)] += jax.lax.dot_general(
            a_ref[:].reshape(th * w_out, 9 * cc), w_ref[b, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th, w_out, cout)

    @pl.when(j == n_cc - 1)
    def _():
        o_ref[:] = jnp.maximum(acc_ref[:], 0.0).astype(jnp.bfloat16)


def aspp_fused(x, weights, th=8, cc=128, interpret=False, kconcat=False):
    """x: (H, W, Cin) bf16.  weights: (27, Cin, Cout) bf16 — the three
    branches' 3x3 kernels stacked [branch*9 + ky*3 + kx].  Returns
    (H, W, 3*Cout) bf16 = concat of relu'd branch outputs (SAME padding,
    matching XLA's conv with rhs_dilation)."""
    h, w, cin = x.shape
    cout = weights.shape[-1]
    n_cc = cin // cc
    ht = -(-h // th) * th
    # the HBM->VMEM slab DMA requires the sublane (column) dim to be a
    # multiple of 8; pad the right edge up
    wp = -(-(w + 2 * DMAX) // 8) * 8
    xp = jnp.pad(x, ((DMAX, DMAX + ht - h),
                     (DMAX, wp - w - DMAX), (0, 0)))
    scratch = [
        pltpu.VMEM((th + 2 * DMAX, wp, cc), jnp.bfloat16),
        pltpu.VMEM((th, w, 3 * cout), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if kconcat:
        # weights restacked to (3, n_cc, 9*cc, cout): branch b chunk j
        # rows are [tap0 chunk-j rows, tap1 chunk-j rows, ...]
        w_k = weights.reshape(3, 9, n_cc, cc, cout).transpose(
            0, 2, 1, 3, 4).reshape(3, n_cc, 9 * cc, cout)
        kern = functools.partial(_aspp_kernel_kconcat, th=th, w_out=w,
                                 cc=cc, cout=cout, n_cc=n_cc)
        w_spec = pl.BlockSpec((3, 1, 9 * cc, cout), lambda i, j: (0, j, 0, 0),
                              memory_space=pltpu.VMEM)
        scratch.insert(1, pltpu.VMEM((th, w, 9 * cc), jnp.bfloat16))
        w_arg = w_k
    else:
        kern = functools.partial(_aspp_kernel, th=th, w_out=w, cc=cc,
                                 cout=cout, n_cc=n_cc)
        w_spec = pl.BlockSpec((27, cc, cout), lambda i, j: (0, j, 0),
                              memory_space=pltpu.VMEM)
        w_arg = weights
    out = pl.pallas_call(
        kern,
        grid=(ht // th, n_cc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded x stays in HBM
            w_spec,
        ],
        out_specs=pl.BlockSpec((th, w, 3 * cout), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ht, w, 3 * cout), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_arg)
    return out[:h]


def aspp_xla(x, kernels):
    """The deploy graph's form: three separate rhs-dilated convs + relu,
    concatenated.  kernels: list of three (3, 3, Cin, Cout) bf16."""
    outs = []
    for d, k in zip(DILATIONS, kernels):
        y = jax.lax.conv_general_dilated(
            x[None], k, (1, 1), "SAME", rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        outs.append(jnp.maximum(y, 0.0).astype(jnp.bfloat16)[0])
    return jnp.concatenate(outs, axis=-1)


def make_weights(rng, cin, cout):
    ks = [jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                      jnp.bfloat16) for _ in DILATIONS]
    stacked = jnp.concatenate(
        [k.reshape(9, cin, cout) for k in ks], axis=0)  # (27, cin, cout)
    return ks, stacked


def stage_n(interpret):
    rng = np.random.default_rng(0)
    h, w, cin, cout = 40, 61, 256, 128
    x = jnp.asarray(rng.standard_normal((h, w, cin)) * 0.5, jnp.bfloat16)
    ks, stacked = make_weights(rng, cin, cout)
    want = np.asarray(aspp_xla(x, ks), np.float32)
    for kconcat in (False, True):
        got = np.asarray(aspp_fused(x, stacked, th=8, cc=128,
                                    interpret=interpret, kconcat=kconcat),
                         np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        print(f"stage N numerics (kconcat={kconcat}): rel-err vs XLA "
              f"dilated convs {err:.3e}")
        assert err < 3e-2, err


def stage_b(iters, interpret, h=129, w=257, cin=2048, cout=128, th=8,
            cc=128, chain=3, kconcat=False):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((h, w, cin)) * 0.5, jnp.bfloat16)
    ks, stacked = make_weights(rng, cin, cout)

    # carried dependency so `chain` calls per dispatch serialize (the
    # tunnel dispatch floor is ~2.5 ms)
    def chained(f):
        @jax.jit
        def run(x, *wargs):
            def body(_, carry):
                out = f(carry, *wargs)
                eps = (out[0, 0, 0].astype(jnp.float32) * 1e-12).astype(
                    jnp.bfloat16)
                return carry + eps
            return jax.lax.fori_loop(0, chain, body, x)
        return run

    f_pallas = chained(functools.partial(aspp_fused, th=th, cc=cc,
                                         interpret=interpret,
                                         kconcat=kconcat))
    f_xla = chained(lambda x, *ks: aspp_xla(x, ks))

    t_p = bench(f_pallas, (x, stacked), iters) / chain
    t_x = bench(f_xla, (x, *ks), iters) / chain
    flops = 2 * h * w * 9 * cin * cout * len(DILATIONS)
    print(f"stage B {h}x{w}x{cin}->3x{cout} d={DILATIONS} "
          f"(x{chain}/dispatch, th={th} cc={cc} kconcat={kconcat}): "
          f"XLA {t_x:.3f} ms ({flops/t_x/1e9:.0f} TFLOP/s) | "
          f"pallas {t_p:.3f} ms ({flops/t_p/1e9:.0f} TFLOP/s) | "
          f"speedup {t_x/t_p:.2f}x")
    return t_x, t_p


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="?", default="NB")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--cc", type=int, default=128)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--kconcat", action="store_true")
    args = ap.parse_args(argv)
    print(f"devices: {jax.devices()}")
    if "N" in args.stages:
        stage_n(args.interpret)
    if "B" in args.stages:
        stage_b(args.iters, args.interpret, cout=args.cout, th=args.th,
                cc=args.cc, kconcat=args.kconcat)
    return 0


if __name__ == "__main__":
    sys.exit(main())
