"""HRNet lane-utilization microbench (ROADMAP "left on the table").

HRNet-W48's stages 3/4 are ~300 small 3x3 convs on 48/96-channel
branches; bf16 NHWC convolution contracts onto the 128-wide MXU with
C=K=48 in the lane dimension (~37% lane use).  The hypothesised fix is a
channels-first rewrite where the WIDTH dimension rides the lanes: build
the 9 shifted (dh, dw) input planes and contract (9*Cin) per output row

    y[h, co, :] = sum_k  W9[co, k] . X9[h, k, :]      (k = 9*Cin)

one dot_general with batch dim h, contraction 9*Cin (432 for C=48 —
MXU-friendly), and lanes = W (513/1025 at deploy scale — full).

This tool measures BOTH layouts standalone at the HRNet deploy branch
shapes and at train-crop shapes, bf16 on the real chip, with numeric
agreement checked.  Standalone timings overstate what an in-graph
rewrite would get (XLA compiles ops differently in context — see
docs/ROADMAP.md "Corrected deploy profile"), so read a LOSS here as
conclusive and a win only as a license to prototype in-graph.

Usage: python tools/exp_hrnet_lanes.py [--iters 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _common import bench, setup_compile_cache, sync  # noqa: E402,F401

setup_compile_cache()


def conv_nhwc(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv_wlanes(xc, k):
    """x in (N, C, H, W); kernel (3, 3, Cin, Cout).  Builds the 9
    shifted planes and contracts (dh, dw, ci) with W as the minor
    (lane) dimension of every operand."""
    n, c, h, w = xc.shape
    xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))
    planes = [xp[:, :, dh:dh + h, dw:dw + w]
              for dh in range(3) for dw in range(3)]
    x9 = jnp.concatenate(planes, axis=1)  # (N, 9C, H, W)
    w9 = jnp.transpose(k, (3, 0, 1, 2)).reshape(
        k.shape[3], -1)  # (Cout, 9*Cin) matching (dh, dw, ci) order
    # y[n, h, co, w] = sum_k w9[co, k] * x9[n, k, h, w]
    y = jnp.einsum("ok,nkhw->nohw", w9, x9,
                   preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


CHAIN = 20  # convs chained per jitted call: these ops are ~0.1 ms, so
# a one-op-per-dispatch loop measures the tunnel dispatch floor
# (~1.3 ms) instead of the kernel


def chain(conv):
    def run(x, k):
        def body(_, y):
            return conv(y, k)
        return jax.lax.fori_loop(0, CHAIN, body, x)
    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)

    # (label, N, H, W, C): HRNet-W48 branch shapes at 1025x2049 deploy
    # (branch i at 1/4 * 2^-i resolution, C = 48 * 2^i) and at the 769²
    # train crop with batch 8
    cases = [
        ("deploy b0 257x513xC48", 1, 257, 513, 48),
        ("deploy b1 129x257xC96", 1, 129, 257, 96),
        ("train  b0 193x193xC48 bs8", 8, 193, 193, 48),
        ("train  b1 97x97xC96 bs8", 8, 97, 97, 96),
        ("control 257x513xC128", 1, 257, 513, 128),
    ]
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for label, n, h, w, c in cases:
        x = jnp.asarray(rng.standard_normal((n, h, w, c)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * c),
                        jnp.bfloat16)
        xc = jnp.transpose(x, (0, 3, 1, 2))
        # agreement (single op)
        a = np.asarray(jax.jit(conv_nhwc)(x, k), np.float32)
        b = np.transpose(np.asarray(jax.jit(conv_wlanes)(xc, k),
                                    np.float32), (0, 2, 3, 1))
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6)
        # timing: CHAIN dependent convs per dispatch
        f_nhwc = jax.jit(chain(conv_nhwc))
        f_wl = jax.jit(chain(conv_wlanes))
        t_nhwc = bench(f_nhwc, (x, k), args.iters) / CHAIN
        t_wl = bench(f_wl, (xc, k), args.iters) / CHAIN
        flops = 2 * 9 * c * c * n * h * w
        print(f"{label}: nhwc {t_nhwc:7.3f} ms ({flops/t_nhwc/1e9:6.1f} "
              f"TFLOP/s) | w-lanes {t_wl:7.3f} ms "
              f"({flops/t_wl/1e9:6.1f} TFLOP/s) | ratio "
              f"{t_nhwc/t_wl:4.2f}x | rel-err {err:.3e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
