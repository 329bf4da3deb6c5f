"""Standalone probes for the deploy stem's first conv (3->64, k3 s2 at
1025x2049).  STANDALONE, XLA runs it at 3.96 ms (~0.45 TFLOP/s — the
3-input-channel conv never reaches the MXU); IN the full deploy graph
its true cost is only ~0.8 ms (tools/exp_suffix.py) — keep that in mind
when reading these numbers.

Variants:
  native   lax.conv_general_dilated as graph_apply emits today
  im2col   9 strided taps concatenated to a 27-channel tensor + one
           (H*W, 27) x (27, 64) matmul
  pad8     input zero-padded to 8 channels, native conv
Each is checked against the native output before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col(x, w):
    n, h, win, cin = x.shape
    ho, wo = (h + 1) // 2, (win + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, i:i + 2 * ho - 1:2, j:j + 2 * wo - 1:2, :]
            for i in range(3) for j in range(3)]
    patches = jnp.concatenate(taps, axis=-1)  # (n, ho, wo, 9*cin)
    wk = w.reshape(9 * cin, w.shape[-1])
    return jnp.einsum("nhwk,ko->nhwo", patches, wk)


def pad8(x, w):
    x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    w8 = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
    return native(x8, w8)


def s2d_im2col(x, w):
    """Extract the 4 stride-2 phase planes once; every 3x3 tap is then a
    unit-stride slice of a phase plane -> one (HW, 27) x (27, 64) matmul."""
    n, h, win, cin = x.shape
    ho, wo = (h + 1) // 2, (win + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phase = {(a, b): xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)}
    taps = []
    for i in range(3):
        for j in range(3):
            p = phase[(i & 1, j & 1)]
            taps.append(p[:, i // 2:i // 2 + ho, j // 2:j // 2 + wo, :])
    patches = jnp.concatenate(taps, axis=-1)
    wk = w.reshape(9 * cin, w.shape[-1])
    return jnp.einsum("nhwk,ko->nhwo", patches, wk)


def s2d_conv(x, w):
    """Reshape-based 2x2 space-to-depth (12ch) + k2 s1 conv whose 4x27
    weights embed the original 3x3 taps (zeros elsewhere)."""
    n, h, win, cin = x.shape
    ho, wo = (h + 1) // 2, (win + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # pad rows/cols to even counts for the reshape
    hp = xp.shape[1] + (xp.shape[1] % 2)
    wp = xp.shape[2] + (xp.shape[2] % 2)
    xp = jnp.pad(xp, ((0, 0), (0, hp - xp.shape[1]),
                      (0, wp - xp.shape[2]), (0, 0)))
    s = xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
    s = s.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)
    # tap (i,j) of the original k3: phase (i&1, j&1), offset (i//2, j//2)
    w2 = jnp.zeros((2, 2, 4 * cin, w.shape[-1]), x.dtype)
    for i in range(3):
        for j in range(3):
            ph = (i & 1) * 2 + (j & 1)
            w2 = w2.at[i // 2, j // 2,
                       ph * cin:(ph + 1) * cin, :].add(w[i, j])
    y = jax.lax.conv_general_dilated(
        s, w2, window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :ho, :wo, :]


def f32(x, w):
    return native(x.astype(jnp.float32),
                  w.astype(jnp.float32)).astype(x.dtype)


def bench(fn, x, w, iters=50):
    run = jax.jit(fn)
    out = run(x, w)
    np.asarray(out.ravel()[0])
    for _ in range(5):
        out = run(x, w)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x, w)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1025, 2049, 3)),
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.1, jnp.bfloat16)
    ms_ref, ref = bench(native, x, w)
    print(f"native : {ms_ref:6.2f} ms", flush=True)
    for name, fn in [("im2col", im2col), ("pad8", pad8),
                     ("s2d_im2col", s2d_im2col), ("s2d_conv", s2d_conv),
                     ("f32", f32)]:
        ms, out = bench(fn, x, w)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{name:7s}: {ms:6.2f} ms  (max |diff| vs native {err:.3e})",
              flush=True)


if __name__ == "__main__":
    main()
