"""Post-training int8 quantization for the deploy path.

The reference deploys via TensorRT fp16 (totrt.py:113-121); TensorRT's
next gear is int8 with a calibration pass.  This is the TPU-native
equivalent: v5e+ MXUs run int8 convs at up to 2x the bf16 rate, so after
BN folding we

1. **calibrate**: run N batches through the f32 graph and record the
   absmax of every quantization point (symmetric per-tensor activation
   scales) — conv inputs AND the tensors that stay int8 between convs;
2. **quantize weights** per output channel (symmetric, int8);
3. **run** convs as ``int8 x int8 -> int32`` and keep activations int8
   *through* relu / maxpool / residual-add / concat (requantized with
   fused elementwise epilogues) so chained convs never bounce through
   bf16.  Ops with real arithmetic (resize, global pooling, sigmoid)
   dequantize to the float dtype.

Quantizing pre-relu with the post-relu scale is exact: symmetric scales
put zero at 0, the positive range is unchanged by relu, and negative
values clip no differently than relu would zero them.

**Measured dead end on v5e (2026-08, tools/exp_deploy.py int8):** the
pruned R101 deploy at 1025x2049 runs 44.0 ms int8 vs 23.7 ms bf16
(0.54x) even with 114/115 convs chained int8->int8 and argmax agreement
1.0000.  Round 1's unchained path was 0.70x; int8 convs are 1.27x bf16
STANDALONE, but in-graph XLA materializes the int32 conv accumulators
before each requant epilogue (2x the HBM bytes of a bf16 activation) and
the elementwise requant chains don't fuse into the convolutions, so the
memory-bound segments dominate.  Until XLA fuses int8 conv epilogues (or
a Pallas conv+requant kernel replaces the hot blocks), bf16 is the
recommended deploy dtype; this module stays as working infrastructure +
the accuracy-guardrail tooling.

Accuracy guardrail without labeled data: ``argmax_agreement`` measures
label-map agreement between the quantized and float models.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.graph.apply import graph_apply
from dcfp_tpu.graph.ir import Graph
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

def quant_points(graph: Graph) -> set:
    """Tensor names that need calibrated scales: conv inputs plus every
    tensor the chained interpreter keeps int8 across (conv outputs and
    add/concat outputs)."""
    pts = set()
    for n in graph.toposorted():
        if n.op == "conv":
            pts.add(n.inputs[0])
            pts.add(n.name)
        elif n.op in ("add", "concat"):
            pts.add(n.name)
    return pts


def calibrate_tensor_scales(graph: Graph, params, state,
                            batches: Iterable[np.ndarray],
                            percentile: float = 100.0
                            ) -> Dict[str, float]:
    """Per-tensor symmetric activation scales (absmax/127, or the given
    percentile of |x| for clipping outliers) at every quantization
    point, from N calibration images through the float graph."""
    probe = graph.copy()
    probe.outputs = sorted(quant_points(graph) | set(graph.inputs))

    @jax.jit
    def stats(params, image):
        outs, _ = graph_apply(probe, params, state, {"image": image})
        if percentile >= 100.0:
            return {k: jnp.max(jnp.abs(v)) for k, v in outs.items()}
        q = percentile / 100.0
        return {k: jnp.quantile(jnp.abs(v).astype(jnp.float32).ravel(), q)
                for k, v in outs.items()}

    amax: Dict[str, float] = {}
    n = 0
    for image in batches:
        s = jax.device_get(stats(params, jnp.asarray(image)))
        for k, v in s.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
        n += 1
    log.info("calibrated activation scales over %d batches", n)
    return {t: max(v, 1e-8) / 127.0 for t, v in amax.items()}


def calibrate_act_scales(graph: Graph, params, state,
                         batches: Iterable[np.ndarray],
                         percentile: float = 100.0) -> Dict[str, float]:
    """Per-conv input activation scales {conv_name: s_in} (thin wrapper
    over :func:`calibrate_tensor_scales`)."""
    tensor_scales = calibrate_tensor_scales(graph, params, state, batches,
                                            percentile)
    return {n.name: tensor_scales[n.inputs[0]]
            for n in graph.conv_nodes()}


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------

_CHAINABLE = {"relu", "maxpool", "identity", "dropout", "add", "concat",
              "conv"}


def quantize_params(graph: Graph, params, act_scales: Dict[str, float],
                    tensor_scales: Optional[Dict[str, float]] = None
                    ) -> Dict[str, Dict]:
    """Per-output-channel symmetric int8 weights + fused rescale factors.

    qparams[conv] = {w_q int8 HWIO, rescale f32[out] (= s_in * s_w),
                     bias f32[out]?} — arrays only; the (static) scales
    live in ``tensor_scales`` so the bundle can be a jit argument.
    Convs without a calibrated scale (shouldn't happen) stay float."""
    tensor_scales = tensor_scales or {}
    q: Dict[str, Dict] = {}
    for node in graph.conv_nodes():
        name = node.name
        if name not in act_scales or node.attrs["groups"] != 1:
            continue
        w = np.asarray(params[name]["kernel"], np.float32)
        s_w = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0
        s_w = np.maximum(s_w, 1e-12)
        w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
        s_in = float(act_scales[name])
        entry = {
            "w_q": jnp.asarray(w_q),
            "rescale": jnp.asarray(s_in * s_w, jnp.float32),
        }
        if "bias" in params[name]:
            entry["bias"] = jnp.asarray(params[name]["bias"], jnp.float32)
        q[name] = entry
    chained = sum(1 for n in graph.conv_nodes() if n.name in q and
                  _emit_scale(graph, n.name, tensor_scales) is not None)
    log.info("quantized %d convs to int8 (%d emit int8 directly)",
             len(q), chained)
    return q


def _emit_scale(graph: Graph, conv_name: str,
                tensor_scales: Dict[str, float]) -> Optional[float]:
    """Scale at which a quantized conv can emit int8 directly: requires a
    calibrated scale for its output tensor and every consumer able to
    carry int8 forward.  None -> emit float."""
    consumers = graph.consumers(conv_name)
    if (conv_name in tensor_scales and consumers
            and conv_name not in graph.outputs
            and all(c.op in _CHAINABLE for c in consumers)):
        return float(tensor_scales[conv_name])
    return None


# ---------------------------------------------------------------------------
# quantized interpreter
# ---------------------------------------------------------------------------

class _QT:
    """int8 tensor + its symmetric per-tensor scale (value = q * s)."""
    __slots__ = ("q", "s")

    def __init__(self, q, s: float):
        self.q, self.s = q, float(s)


def _to_float(v, dtype):
    if isinstance(v, _QT):
        return (v.q.astype(jnp.float32) * v.s).astype(dtype)
    return v


def _to_q(v, s: float, dtype):
    """(Re)quantize a float tensor or a _QT to scale ``s``."""
    if isinstance(v, _QT):
        if abs(v.s - s) < 1e-12 * max(s, v.s):
            return v.q
        return jnp.clip(jnp.round(v.q.astype(jnp.float32) * (v.s / s)),
                        -127, 127).astype(jnp.int8)
    return jnp.clip(jnp.round(v.astype(jnp.float32) * (1.0 / s)),
                    -127, 127).astype(jnp.int8)


def _qconv(v, node, qp, s_in, s_out, compute_dtype):
    """int8 conv.  Emits a _QT at the conv output's calibrated scale
    ``s_out`` (when not None) so downstream convs chain in int8, else a
    float tensor.  The requant epilogue is elementwise and fuses into the
    conv output — no HBM bounce through bf16."""
    a = node.attrs
    pad = a["padding"]
    x_q = _to_q(v, s_in, compute_dtype)
    acc = jax.lax.conv_general_dilated(
        x_q, qp["w_q"],
        window_strides=(a["stride"], a["stride"]),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(a["dilation"], a["dilation"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * qp["rescale"]
    if "bias" in qp:
        y = y + qp["bias"]
    if s_out is not None:
        q = jnp.clip(jnp.round(y * (1.0 / s_out)), -127, 127
                     ).astype(jnp.int8)
        return _QT(q, s_out)
    return y.astype(compute_dtype)


def quant_graph_apply(graph: Graph, params, state, qparams: Dict,
                      inputs, compute_dtype=jnp.bfloat16,
                      tensor_scales: Optional[Dict[str, float]] = None):
    """graph_apply with int8 convs chained through relu / maxpool /
    residual-add / concat.  Non-conv arithmetic and any conv missing from
    ``qparams`` run the float path."""
    from dcfp_tpu.graph import apply as A

    tensor_scales = tensor_scales or {}
    vals: Dict = {}
    input_hw = None

    def fv(name):  # float view of a stored value
        return _to_float(vals[name], compute_dtype)

    for node in graph.toposorted():
        op = node.op
        if op == "input":
            y = inputs[node.name].astype(compute_dtype)
            input_hw = (y.shape[-3], y.shape[-2])
        elif op == "conv":
            if node.name in qparams and node.inputs[0] in tensor_scales:
                y = _qconv(vals[node.inputs[0]], node, qparams[node.name],
                           float(tensor_scales[node.inputs[0]]),
                           _emit_scale(graph, node.name, tensor_scales),
                           compute_dtype)
            else:
                y = A._conv(fv(node.inputs[0]), node, params[node.name])
        elif op == "bn":
            y, _ = A._bn(fv(node.inputs[0]), node, params[node.name],
                         state[node.name], False)
        elif op == "relu":
            v = vals[node.inputs[0]]
            # int8 relu: symmetric scale keeps zero at 0
            y = (_QT(jnp.maximum(v.q, 0), v.s) if isinstance(v, _QT)
                 else jax.nn.relu(v))
        elif op == "sigmoid":
            y = jax.nn.sigmoid(fv(node.inputs[0]))
        elif op == "add":
            ins = [vals[i] for i in node.inputs]
            s_out = tensor_scales.get(node.name)
            if s_out is not None and all(isinstance(v, _QT) for v in ins):
                # requant-and-add fused elementwise: q3 = clip(round(
                # q1*(s1/s3) + q2*(s2/s3)))
                acc = ins[0].q.astype(jnp.float32) * (ins[0].s / s_out)
                for v in ins[1:]:
                    acc = acc + v.q.astype(jnp.float32) * (v.s / s_out)
                y = _QT(jnp.clip(jnp.round(acc), -127, 127
                                 ).astype(jnp.int8), s_out)
            else:
                y = _to_float(ins[0], compute_dtype)
                for v in ins[1:]:
                    y = y + _to_float(v, compute_dtype)
        elif op == "mul":
            y = fv(node.inputs[0])
            for other in node.inputs[1:]:
                y = y * fv(other)
        elif op == "concat":
            ins = [vals[i] for i in node.inputs]
            s_out = tensor_scales.get(node.name)
            if s_out is not None and all(isinstance(v, _QT) for v in ins):
                y = _QT(jnp.concatenate(
                    [_to_q(v, s_out, compute_dtype) for v in ins],
                    axis=-1), s_out)
            else:
                y = jnp.concatenate(
                    [_to_float(v, compute_dtype) for v in ins], axis=-1)
        elif op == "maxpool":
            a = node.attrs
            from dcfp_tpu.ops.pool import max_pool
            v = vals[node.inputs[0]]
            if isinstance(v, _QT):  # monotonic: stays int8
                y = _QT(max_pool(v.q, a["kernel"], a["stride"],
                                 a["padding"]), v.s)
            else:
                y = max_pool(v, a["kernel"], a["stride"], a["padding"])
        elif op == "avgpool":
            from dcfp_tpu.ops.pool import adaptive_avg_pool
            y = adaptive_avg_pool(fv(node.inputs[0]),
                                  node.attrs["out_size"])
        elif op == "globalpool":
            from dcfp_tpu.ops.pool import global_avg_pool
            y = global_avg_pool(fv(node.inputs[0]))
        elif op == "resize":
            from dcfp_tpu.ops.resize import resize_bilinear
            x = fv(node.inputs[0])
            a = node.attrs
            if "like" in a:
                ref = vals[a["like"]]
                if isinstance(ref, _QT):  # shape lives on the int8 payload
                    ref = ref.q
                target = (ref.shape[-3], ref.shape[-2])
            elif a.get("to_input"):
                target = input_hw
            else:
                target = (int(round(x.shape[-3] * a["scale"])),
                          int(round(x.shape[-2] * a["scale"])))
            y = resize_bilinear(x, target, a["align_corners"])
        elif op in ("identity", "dropout"):
            y = vals[node.inputs[0]]
        else:
            raise NotImplementedError(f"op {op!r} in quantized graph")
        vals[node.name] = y
    return {name: _to_float(vals[name], compute_dtype)
            for name in graph.outputs}


# ---------------------------------------------------------------------------
# deploy entry
# ---------------------------------------------------------------------------

def make_int8_inference_fn(graph: Graph, params, state, *,
                           calib_batches: Iterable[np.ndarray],
                           percentile: float = 100.0,
                           output: str = "argmax",
                           compute_dtype=jnp.bfloat16):
    """BN-fold, calibrate, quantize; returns (fn, bundle) with
    fn(bundle, image) -> labels/logits."""
    from dcfp_tpu.engine.deploy import fold_batchnorm
    graph, params, state = fold_batchnorm(graph, params, state)
    tensor_scales = calibrate_tensor_scales(graph, params, state,
                                            calib_batches, percentile)
    act_scales = {n.name: tensor_scales[n.inputs[0]]
                  for n in graph.conv_nodes()}
    qparams = quantize_params(graph, params, act_scales=act_scales,
                              tensor_scales=tensor_scales)
    float_params = {k: jax.tree.map(
        lambda x: jnp.asarray(x, compute_dtype)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x), v)
        for k, v in params.items() if k not in qparams}

    tail_resize = None
    run_graph = graph
    if output == "argmax" and "pred" in graph.nodes:
        node = graph.node("pred")
        if node.op == "resize" and node.attrs.get("to_input"):
            tail_resize = node
            run_graph = graph.copy()
            run_graph.outputs = [node.inputs[0] if o == "pred" else o
                                 for o in run_graph.outputs]

    bundle = {"q": qparams, "f": float_params}

    def fn(bundle, image):
        outs = quant_graph_apply(run_graph, bundle["f"], state, bundle["q"],
                                 {"image": image},
                                 compute_dtype=compute_dtype,
                                 tensor_scales=tensor_scales)
        if tail_resize is not None:
            from dcfp_tpu.ops.pallas_kernels import resize_argmax
            return resize_argmax(outs[tail_resize.inputs[0]],
                                 image.shape[1:3],
                                 tail_resize.attrs["align_corners"])
        pred = outs["pred"]
        if output == "argmax":
            return jnp.argmax(pred, axis=-1).astype(jnp.uint8)
        return pred.astype(jnp.float32)

    return fn, bundle


def argmax_agreement(labels_a: np.ndarray, labels_b: np.ndarray) -> float:
    """Fraction of pixels where two label maps agree (the data-free
    accuracy guardrail for quantization)."""
    return float((np.asarray(labels_a) == np.asarray(labels_b)).mean())
