"""Standalone A/B of the fused bottleneck kernel vs XLA's unfused chain
at the pruned layer3 deploy shape (129x257, 1024->128->128->1024, d=2).

Target (tools/exp_suffix.py): XLA runs the 23-block layer3 at 6.25 ms
(~0.27 ms/block); kernel roofline is ~0.17 ms (HBM) / ~0.14 ms (MXU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.ops.bottleneck import fused_bottleneck
from tests.test_bottleneck import reference_chain


def bench(fn, args, iters=100):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    for _ in range(10):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    h, w, cin, cm, d = 129, 257, 1024, 128, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((h, w, cin)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cm)) * 0.04,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * 0.08,
                     jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((1, 1, cm, cin)) * 0.08,
                     jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(cm) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(cm) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(cin) * 0.1, jnp.float32)
    args = (x, w1, b1, w2, b2, w3, b3)

    ref = jax.jit(lambda *a: reference_chain(*a, d))
    ms_ref, out_ref = bench(ref, args)
    print(f"xla chain : {ms_ref:6.3f} ms", flush=True)

    fused = jax.jit(lambda *a: fused_bottleneck(*a, dilation=d,
                                                interpret=False))
    ms_f, out_f = bench(fused, args)
    diff = np.abs(np.asarray(out_f, np.float32)
                  - np.asarray(out_ref, np.float32))
    gf = (h * w * (2 * cin * cm + 9 * cm * cm) * 2) / 1e9
    print(f"fused     : {ms_f:6.3f} ms  ({gf / ms_f:.1f} TFLOP/s, "
          f"max|diff|={diff.max():.3f}, frac>0.05={(diff > 0.05).mean():.4f})",
          flush=True)


if __name__ == "__main__":
    main()
