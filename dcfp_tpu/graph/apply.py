"""Interpreter + initializer for the layer-graph IR.

`graph_apply` walks the DAG once per trace; under `jax.jit` XLA sees the
same primitive stream a hand-written forward would emit and fuses it.  All
tensors are NHWC, conv kernels HWIO (TPU-native layouts).

BatchNorm note (SyncBN parity): batch moments are computed with plain
`jnp.mean` over (N, H, W).  Under `pjit` with the batch sharded across the
`data` mesh axis, that mean is *global* — XLA inserts the cross-chip
reduction — so synchronized BN (reference: engine.py:65
`convert_sync_batchnorm`) falls out of SPMD semantics with zero extra code.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.graph.ir import Graph, Node
from dcfp_tpu.ops.pool import adaptive_avg_pool, global_avg_pool, max_pool
from dcfp_tpu.ops.resize import resize_bilinear

Params = Dict[str, Dict[str, jnp.ndarray]]
State = Dict[str, Dict[str, jnp.ndarray]]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_graph(graph: Graph, rng: jax.Array, dtype=jnp.float32
               ) -> Tuple[Params, State]:
    """Initialize params/state for every parametric node.

    Convs follow torch's default kaiming-uniform(a=sqrt(5)) — i.e.
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — so randomly-initialized nets match
    the reference's statistics; BN starts at scale=1, bias=0.
    """
    params: Params = {}
    state: State = {}
    for node in graph.toposorted():
        if node.op == "conv":
            a = node.attrs
            rng, k1, k2 = jax.random.split(rng, 3)
            fan_in = a["kernel"] * a["kernel"] * (a["in_ch"] // a["groups"])
            bound = 1.0 / math.sqrt(fan_in)
            shape = (a["kernel"], a["kernel"], a["in_ch"] // a["groups"],
                     a["out_ch"])
            p = {"kernel": jax.random.uniform(k1, shape, dtype, -bound, bound)}
            if a["bias"]:
                p["bias"] = jax.random.uniform(
                    k2, (a["out_ch"],), dtype, -bound, bound)
            params[node.name] = p
        elif node.op == "bn":
            ch = node.attrs["channels"]
            params[node.name] = {
                "scale": jnp.ones((ch,), dtype),
                "bias": jnp.zeros((ch,), dtype),
            }
            state[node.name] = {
                "mean": jnp.zeros((ch,), jnp.float32),
                "var": jnp.ones((ch,), jnp.float32),
            }
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

# Above this dilation, XLA's native dilated conv drops to ~22 TFLOP/s on
# TPU v5e (vs ~75 for small dilations); the 9-shifted-matmul decomposition
# below stays at full matmul efficiency (measured 3.4x faster at the ASPP
# rates 24/36 used for output-stride 8).
DILATED_MATMUL_MIN = 18


def _dilated3x3_as_matmuls(x, kernel, d: int):
    """3x3 conv with rhs_dilation d, 'same' padding d, stride 1, as nine
    shifted pixel-matmuls: y = sum_ij shift(x, (i-1)d, (j-1)d) @ W[i,j]."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, i * d, j * d, 0),
                                       (n, h, w, c))
            t = jnp.einsum("nhwc,co->nhwo", xs, kernel[i, j],
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out


def _conv(x, node: Node, p):
    a = node.attrs
    pad = a["padding"]
    # NOTE (measured, v5e): rewriting the thin stem conv (3ch, k3 s2) via
    # 2x2 space-to-depth is a NET LOSS here (41.8 -> 37.6 img/s e2e) —
    # the input-layout shuffle costs more than the MXU contraction gain.
    if (a["kernel"] == 3 and a["dilation"] >= DILATED_MATMUL_MIN
            and a["stride"] == 1 and a["groups"] == 1
            and pad == a["dilation"]):
        y = _dilated3x3_as_matmuls(x, p["kernel"].astype(x.dtype),
                                   a["dilation"])
        if a["bias"]:
            y = y + p["bias"].astype(y.dtype)
        return y.astype(x.dtype)
    # f32 inputs: request f32 accumulation explicitly.  bf16 inputs: leave
    # preferred_element_type unset — the TPU MXU accumulates in f32
    # internally anyway, and forcing an f32 output breaks the conv
    # transpose (grad) rule with mixed bf16/f32 operands.
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(a["stride"], a["stride"]),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(a["dilation"], a["dilation"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=a["groups"],
        preferred_element_type=pet,
    )
    if a["bias"]:
        y = y + p["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def _bn(x, node: Node, p, s, train: bool):
    a = node.attrs
    eps, mom = a["eps"], a["momentum"]
    new_s = None
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        count = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (count / max(count - 1, 1))
        new_s = {
            "mean": (1 - mom) * s["mean"] + mom * mean,
            "var": (1 - mom) * s["var"] + mom * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    y = x.astype(jnp.float32) * inv + shift
    return y.astype(x.dtype), new_s


def _dropout(x, node: Node, rng, train: bool):
    rate = node.attrs["rate"]
    if not train or rate == 0.0 or rng is None:
        return x
    if node.attrs["spatial"]:
        shape = (x.shape[0], 1, 1, x.shape[-1])
    else:
        shape = x.shape
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _exec_node(node: Node, vals: Dict[str, jnp.ndarray], params: Params,
               state: State, train: bool, drop_rngs: Dict[str, jax.Array],
               input_hw: Tuple[int, int]):
    """Execute one non-input node.  Returns (y, bn_update_or_None)."""
    op = node.op
    ns = None
    if op == "conv":
        y = _conv(vals[node.inputs[0]], node, params[node.name])
    elif op == "bn":
        y, ns = _bn(vals[node.inputs[0]], node, params[node.name],
                    state[node.name], train)
    elif op == "relu":
        y = jax.nn.relu(vals[node.inputs[0]])
    elif op == "sigmoid":
        y = jax.nn.sigmoid(vals[node.inputs[0]])
    elif op == "mul":
        y = vals[node.inputs[0]]
        for other in node.inputs[1:]:
            y = y * vals[other]
    elif op == "add":
        y = vals[node.inputs[0]]
        for other in node.inputs[1:]:
            y = y + vals[other]
    elif op == "concat":
        y = jnp.concatenate([vals[i] for i in node.inputs], axis=-1)
    elif op == "maxpool":
        a = node.attrs
        y = max_pool(vals[node.inputs[0]], a["kernel"], a["stride"],
                     a["padding"])
    elif op == "avgpool":
        y = adaptive_avg_pool(vals[node.inputs[0]],
                              node.attrs["out_size"])
    elif op == "globalpool":
        y = global_avg_pool(vals[node.inputs[0]])
    elif op == "resize":
        x = vals[node.inputs[0]]
        a = node.attrs
        if "like" in a:
            ref = vals[a["like"]]
            target = (ref.shape[-3], ref.shape[-2])
        elif a.get("to_input"):
            target = input_hw
        else:
            target = (int(round(x.shape[-3] * a["scale"])),
                      int(round(x.shape[-2] * a["scale"])))
        y = resize_bilinear(x, target, a["align_corners"])
    elif op == "dropout":
        y = _dropout(vals[node.inputs[0]], node,
                     drop_rngs.get(node.name), train)
    elif op == "identity":
        y = vals[node.inputs[0]]
    elif op == "barrier":
        # deploy-time materialization point: stops XLA from fusing
        # the producer into every consumer tile (see
        # engine/deploy.insert_barriers for when this wins)
        y = jax.lax.optimization_barrier(vals[node.inputs[0]])
    else:
        raise NotImplementedError(f"op {op!r} ({node.name})")
    return y, ns


def graph_apply(graph: Graph, params: Params, state: State,
                inputs: Dict[str, jnp.ndarray], *, train: bool = False,
                rng: Optional[jax.Array] = None,
                input_hw: Optional[Tuple[int, int]] = None,
                remat_segments: int = 0
                ) -> Tuple[Dict[str, jnp.ndarray], State]:
    """Run the graph.  Returns ({output_name: tensor}, new_state).

    `new_state` contains updated BN running stats for nodes touched in
    train mode (unchanged entries are passed through), so callers can carry
    it functionally.

    `input_hw` overrides the spatial size that `resize(to_input=True)`
    nodes target — needed when the graph has been re-rooted at an interior
    node (fast stem paths) and its input tensor is no longer the image.

    `remat_segments` > 1 splits the node sequence into that many
    `jax.checkpoint` segments: only the tensors live at segment
    boundaries are saved for the backward pass; everything inside a
    segment is recomputed.  Activation memory drops roughly by the
    segment count at ~1/3 extra FLOPs — the standard TPU trade when HBM,
    not compute, caps the batch (the reference has no equivalent;
    torch.utils.checkpoint exists but DCFP never uses it).  Numerically
    identical: dropout keys are passed into each segment, so recompute
    replays the same randomness.
    """
    n_dropout = sum(1 for n in graph.toposorted() if n.op == "dropout")
    drop_rngs: Dict[str, jax.Array] = {}
    if rng is not None and n_dropout:
        keys = jax.random.split(rng, n_dropout)
        i = 0
        for n in graph.toposorted():
            if n.op == "dropout":
                drop_rngs[n.name] = keys[i]
                i += 1

    if remat_segments > 1:
        return _graph_apply_remat(graph, params, state, inputs,
                                  train=train, drop_rngs=drop_rngs,
                                  input_hw=input_hw,
                                  n_segments=remat_segments)

    vals: Dict[str, jnp.ndarray] = {}
    new_state: State = dict(state)

    # reference counts so eager (non-jit) execution frees activations early
    refs: Dict[str, int] = {}
    for node in graph.toposorted():
        for parent in node.inputs:
            refs[parent] = refs.get(parent, 0) + 1
    for out in set(graph.outputs) | set(graph.inputs):
        refs[out] = refs.get(out, 0) + 1

    for node in graph.toposorted():
        if node.op == "input":
            y = inputs[node.name]
            if input_hw is None:
                input_hw = (y.shape[-3], y.shape[-2])
        else:
            y, ns = _exec_node(node, vals, params, state, train,
                               drop_rngs, input_hw)
            if ns is not None:
                new_state[node.name] = ns

        vals[node.name] = y
        # release dead activations (no-op under jit, real savings eagerly)
        for parent in node.inputs:
            refs[parent] -= 1
            if refs[parent] == 0:
                del vals[parent]

    outputs = {name: vals[name] for name in graph.outputs}
    return outputs, new_state


def _graph_apply_remat(graph: Graph, params: Params, state: State,
                       inputs: Dict[str, jnp.ndarray], *, train: bool,
                       drop_rngs: Dict[str, jax.Array],
                       input_hw: Optional[Tuple[int, int]],
                       n_segments: int
                       ) -> Tuple[Dict[str, jnp.ndarray], State]:
    """Segmented execution with `jax.checkpoint` around each segment.

    Cut points are chosen near equal node counts, nudged to the position
    with the fewest live tensors in a window (stage boundaries of a
    ResNet carry a single tensor; cutting mid-ASPP would carry five).
    """
    nodes = [n for n in graph.toposorted() if n.op != "input"]
    vals = {name: inputs[name] for name in graph.inputs}
    if input_hw is None:
        first = vals[graph.inputs[0]]
        input_hw = (first.shape[-3], first.shape[-2])

    # liveness: last index at which each tensor is consumed
    last_use = {name: -1 for name in vals}
    for i, node in enumerate(nodes):
        for parent in node.inputs:
            last_use[parent] = i
        last_use[node.name] = last_use.get(node.name, -1)
    for out in graph.outputs:
        last_use[out] = len(nodes)

    def live_after(i: int):
        """Tensors that must cross the boundary after nodes[i]."""
        produced = set(graph.inputs) | {n.name for n in nodes[:i + 1]}
        return sorted(t for t in produced if last_use[t] > i)

    # pick cut positions: around each equal-count target, the index with
    # the smallest boundary-carry count wins
    n_segments = min(n_segments, len(nodes))
    cuts = []
    window = max(len(nodes) // (4 * n_segments), 1)
    for k in range(1, n_segments):
        target = k * len(nodes) // n_segments
        lo = max(target - window, (cuts[-1] + 1) if cuts else 0)
        hi = min(target + window, len(nodes) - 2)
        if lo > hi:
            continue
        best = min(range(lo, hi + 1), key=lambda i: len(live_after(i)))
        cuts.append(best)
    bounds = [0] + [c + 1 for c in cuts] + [len(nodes)]

    new_state: State = dict(state)
    for s in range(len(bounds) - 1):
        seg_nodes = nodes[bounds[s]:bounds[s + 1]]
        carry_out = live_after(bounds[s + 1] - 1)
        seg_drop = {n.name: drop_rngs[n.name] for n in seg_nodes
                    if n.name in drop_rngs}

        def seg_fn(carry, params, state, seg_drop, *, _nodes=seg_nodes,
                   _out=carry_out):
            v = dict(carry)
            bn_updates = {}
            for node in _nodes:
                y, ns = _exec_node(node, v, params, state, train,
                                   seg_drop, input_hw)
                if ns is not None:
                    bn_updates[node.name] = ns
                v[node.name] = y
            return {t: v[t] for t in _out}, bn_updates

        vals, bn_updates = jax.checkpoint(seg_fn)(vals, params, state,
                                                  seg_drop)
        new_state.update(bn_updates)

    outputs = {name: vals[name] for name in graph.outputs}
    return outputs, new_state
