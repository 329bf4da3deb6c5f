"""Fast first-conv (stem) paths for thin input channels.

Measured on TPU v5e at the deploy resolution (1025x2049, reference
totrt.py shape): NHWC tensors with C=3 are lane-padded 3->128 (a ~42x
physical blowup), and a STANDALONE XLA conv on them runs at ~0.45
TFLOP/s (3.96 ms).  Inside the full deploy graph XLA does much better —
suffix-profiling (tools/exp_suffix.py) puts the in-graph stem conv at
only ~0.8 ms of a 23.7 ms pruned DeepLabV3-R101 forward, so the
end-to-end headroom here is small.  Two exact alternatives:

* :func:`conv3x3_s2_nchw` — takes the image in NCHW (the reference
  deploy engine's own input format, totrt.py:113 feeds (1,3,H,W)) whose
  per-channel planes have healthy wide-lane layouts, and performs the
  stride-2 tap selection as one-hot DECIMATION MATMULS on the MXU
  followed by the 27-tap weight contraction.  Pure XLA.  1.39 ms
  standalone; e2e 23.39 vs 23.71 ms (+1.4% img/s, argmax-exact).

* ``pallas_kernels.stem_conv3x3_s2`` — consumes precomputed stride-2
  phase planes (host-side ``extract_stem_phases``) where every tap is a
  unit-stride window; one Pallas kernel.  1.31 ms standalone; e2e
  neutral (23.68 ms), kept for the odd-shape/standalone cases.

Both replace only the stem conv; the rest of the graph is >=64-channel
NHWC and unaffected.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _row_decim(h_pad: int, h_out: int) -> np.ndarray:
    """(3, h_out, h_pad) one-hot E with E[i, h, 2h+i] = 1."""
    e = np.zeros((3, h_out, h_pad), np.float32)
    idx = np.arange(h_out)
    for i in range(3):
        valid = 2 * idx + i < h_pad
        e[i, idx[valid], 2 * idx[valid] + i] = 1.0
    return e


@functools.lru_cache(maxsize=32)
def _col_decim(w_pad: int, w_out: int) -> np.ndarray:
    """(3, w_pad, w_out) one-hot F with F[j, 2w+j, w] = 1."""
    f = np.zeros((3, w_pad, w_out), np.float32)
    idx = np.arange(w_out)
    for j in range(3):
        valid = 2 * idx + j < w_pad
        f[j, 2 * idx[valid] + j, idx[valid]] = 1.0
    return f


def conv3x3_s2_nchw(x_chw: jnp.ndarray, kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """3x3 / stride-2 / padding-1 conv from a channel-major (C, H, W)
    image; returns (Hout, Wout, out_ch) NHWC-minor output.

    kernel: (3, 3, C, out_ch) HWIO.  Tap selection runs as one-hot
    matmuls (E_i @ X_c @ F_j) so the thin-channel input never takes
    XLA's slow conv or strided-slice paths; the contraction order is a
    plain sum over the 9*C taps, f32-accumulated.
    """
    c, h, w = x_chw.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    e = jnp.asarray(_row_decim(h + 2, ho), compute_dtype)
    f = jnp.asarray(_col_decim(w + 2, wo), compute_dtype)
    xp = jnp.pad(x_chw, ((0, 0), (1, 1), (1, 1))).astype(compute_dtype)
    t1 = jnp.einsum("ihr,crw->ichw", e, xp,
                    preferred_element_type=jnp.float32).astype(compute_dtype)
    t2 = jnp.einsum("ichw,jwv->ijchv", t1, f,
                    preferred_element_type=jnp.float32).astype(compute_dtype)
    y = jnp.einsum("ijchv,ijco->hvo", t2, kernel.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def stem_plan(graph) -> Optional[Tuple[str, str]]:
    """If the graph's (single) input feeds exactly one conv that the fast
    stem paths cover — k3, stride 2, padding 1, dilation 1, groups 1,
    in_ch <= 4 — return (input_name, conv_name), else None."""
    if len(graph.inputs) != 1:
        return None
    inp = graph.inputs[0]
    consumers = graph.consumers(inp)
    if len(consumers) != 1 or consumers[0].op != "conv":
        return None
    a = consumers[0].attrs
    if (a["kernel"] == 3 and a["stride"] == 2 and a["padding"] == 1
            and a["dilation"] == 1 and a["groups"] == 1
            and a["in_ch"] <= 4):
        return inp, consumers[0].name
    return None
