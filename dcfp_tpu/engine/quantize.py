"""Post-training int8 quantization for the deploy path.

The reference deploys via TensorRT fp16 (totrt.py:113-121); TensorRT's
next gear is int8 with a calibration pass.  This is the TPU-native
equivalent: v5e+ MXUs run int8 convs at up to 2x the bf16 rate, so after
BN folding we

1. **calibrate**: run N batches through the f32 graph and record the
   absmax of every conv input (symmetric per-tensor activation scales);
2. **quantize weights** per output channel (symmetric, int8);
3. **run** convs as ``int8 x int8 -> int32`` with a single fused rescale
   ``y = acc * (s_in * s_w[o]) + bias`` back to bf16; everything else
   (pool/resize/add/concat) stays bf16.

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

def calibrate_act_scales(graph: Graph, params, state,
                         batches: Iterable[np.ndarray],
                         percentile: float = 100.0) -> Dict[str, float]:
    """Per-conv input activation scales from N calibration images.

    Returns {conv_name: s_in} with s_in = absmax(input)/127 (or the given
    percentile of |x| for clipping outliers)."""
    conv_inputs = {n.name: n.inputs[0] for n in graph.conv_nodes()}
    probe = graph.copy()
    probe.outputs = sorted(set(conv_inputs.values()) | set(graph.inputs))

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
    return {conv: max(amax[src], 1e-8) / 127.0
            for conv, src in conv_inputs.items()}


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------

def quantize_params(graph: Graph, params, act_scales: Dict[str, float]
                    ) -> Dict[str, Dict]:
    """Per-output-channel symmetric int8 weights + fused rescale factors.

    qparams[conv] = {w_q int8 HWIO, rescale f32[out] (= s_in * s_w),
                     inv_s_in f32, bias f32[out]?}.
    Convs without a calibrated scale (shouldn't happen) stay float."""
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
            "inv_s_in": jnp.float32(1.0 / s_in),
        }
        if "bias" in params[name]:
            entry["bias"] = jnp.asarray(params[name]["bias"], jnp.float32)
        q[name] = entry
    log.info("quantized %d convs to int8", len(q))
    return q


# ---------------------------------------------------------------------------
# quantized interpreter
# ---------------------------------------------------------------------------

def _qconv(x, node, qp, compute_dtype):
    a = node.attrs
    pad = a["padding"]
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * qp["inv_s_in"]),
                   -127, 127).astype(jnp.int8)
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
    return y.astype(compute_dtype)


def quant_graph_apply(graph: Graph, params, state, qparams: Dict,
                      inputs, compute_dtype=jnp.bfloat16):
    """graph_apply with int8 convs.  Non-conv nodes and any conv missing
    from ``qparams`` run the float path."""
    from dcfp_tpu.graph import apply as A

    vals: Dict[str, jnp.ndarray] = {}
    input_hw = None
    for node in graph.toposorted():
        op = node.op
        if op == "input":
            y = inputs[node.name].astype(compute_dtype)
            input_hw = (y.shape[-3], y.shape[-2])
        elif op == "conv":
            if node.name in qparams:
                y = _qconv(vals[node.inputs[0]], node, qparams[node.name],
                           compute_dtype)
            else:
                y = A._conv(vals[node.inputs[0]], node, params[node.name])
        elif op == "bn":
            y, _ = A._bn(vals[node.inputs[0]], node, params[node.name],
                         state[node.name], False)
        elif op == "relu":
            y = jax.nn.relu(vals[node.inputs[0]])
        elif op == "sigmoid":
            y = jax.nn.sigmoid(vals[node.inputs[0]])
        elif op == "add":
            y = vals[node.inputs[0]]
            for other in node.inputs[1:]:
                y = y + vals[other]
        elif op == "mul":
            y = vals[node.inputs[0]]
            for other in node.inputs[1:]:
                y = y * vals[other]
        elif op == "concat":
            y = jnp.concatenate([vals[i] for i in node.inputs], axis=-1)
        elif op == "maxpool":
            a = node.attrs
            from dcfp_tpu.ops.pool import max_pool
            y = max_pool(vals[node.inputs[0]], a["kernel"], a["stride"],
                         a["padding"])
        elif op == "avgpool":
            from dcfp_tpu.ops.pool import adaptive_avg_pool
            y = adaptive_avg_pool(vals[node.inputs[0]],
                                  node.attrs["out_size"])
        elif op == "globalpool":
            from dcfp_tpu.ops.pool import global_avg_pool
            y = global_avg_pool(vals[node.inputs[0]])
        elif op == "resize":
            from dcfp_tpu.ops.resize import resize_bilinear
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
        elif op in ("identity", "dropout"):
            y = vals[node.inputs[0]]
        else:
            raise NotImplementedError(f"op {op!r} in quantized graph")
        vals[node.name] = y
    return {name: vals[name] for name in graph.outputs}


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
    scales = calibrate_act_scales(graph, params, state, calib_batches,
                                  percentile)
    qparams = quantize_params(graph, params, act_scales=scales)
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
                                 compute_dtype=compute_dtype)
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
