"""Convert torch checkpoints (reference format) to graph params/state.

Because graph node names equal the reference's module paths, conversion is
name-driven: ``<name>.weight`` of a conv becomes ``params[name]['kernel']``
transposed OIHW->HWIO; BN ``weight``/``bias`` become scale/bias and
``running_mean``/``running_var`` become state.  Handles the reference's
checkpoint wrappers ``{'model': ...}`` / ``{'state_dict': ...}`` and the
``module.`` DDP prefix (reference utils/pyt_utils.py:43-96 load_model).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from dcfp_tpu.graph.ir import Graph
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


def _unwrap(sd: Mapping[str, Any]) -> Mapping[str, Any]:
    if "model" in sd and isinstance(sd["model"], Mapping):
        sd = sd["model"]
    elif "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
    return sd


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def torch_state_dict_to_graph(graph: Graph, sd: Mapping[str, Any], *,
                              prefix: str = "", strict: bool = False
                              ) -> Tuple[Dict, Dict, Dict]:
    """Returns (params, state, report).  ``prefix`` is prepended to graph
    node names when looking up torch keys (use ``prefix=''`` for full-model
    checkpoints; a bare ImageNet backbone loads into the ``backbone.``-less
    namespace via ``prefix=None`` semantics handled by the caller)."""
    sd = _unwrap(sd)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    state: Dict[str, Dict[str, np.ndarray]] = {}
    missing, loaded = [], []
    for node in graph.toposorted():
        key = prefix + node.name
        if node.op == "conv":
            wkey = f"{key}.weight"
            if wkey not in sd:
                missing.append(wkey)
                continue
            w = _to_np(sd[wkey])  # OIHW
            p = {"kernel": np.ascontiguousarray(
                np.transpose(w, (2, 3, 1, 0)).astype(np.float32))}
            bkey = f"{key}.bias"
            if node.attrs["bias"]:
                if bkey in sd:
                    p["bias"] = _to_np(sd[bkey]).astype(np.float32)
                else:
                    p["bias"] = np.zeros((node.attrs["out_ch"],), np.float32)
                    missing.append(bkey)
            params[node.name] = p
            loaded.append(key)
        elif node.op == "bn":
            wkey = f"{key}.weight"
            if wkey not in sd:
                missing.append(wkey)
                continue
            params[node.name] = {
                "scale": _to_np(sd[wkey]).astype(np.float32),
                "bias": _to_np(sd[f"{key}.bias"]).astype(np.float32),
            }
            state[node.name] = {
                "mean": _to_np(sd[f"{key}.running_mean"]).astype(np.float32),
                "var": _to_np(sd[f"{key}.running_var"]).astype(np.float32),
            }
            loaded.append(key)
    graph_keys = {prefix + n.name for n in graph.param_nodes()}
    unexpected = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.endswith((".weight",))}
        - graph_keys)
    report = {"missing": missing, "unexpected": unexpected,
              "loaded": len(loaded)}
    if missing:
        log.warning("convert: %d missing keys (e.g. %s)", len(missing),
                    missing[:4])
    if strict and (missing or unexpected):
        raise KeyError(f"strict conversion failed: {report}")
    return params, state, report


def load_torch_checkpoint(graph: Graph, path: str, *, prefix: str = "",
                          strict: bool = False):
    """Load a torch ``.pth`` file from disk (requires torch, CPU-only)."""
    from dcfp_tpu.utils.checkpoint import _torch_load
    sd = _torch_load(path)
    return torch_state_dict_to_graph(graph, sd, prefix=prefix, strict=strict)


def to_torch_state_dict(params: Mapping[str, Any],
                        state: Optional[Mapping[str, Any]] = None) -> Dict:
    """Graph params/state -> a reference-format torch state_dict
    (``<name>.weight`` OIHW kernels, BN weight/bias/running_mean/
    running_var), so artifacts produced here can be consumed by the
    reference's ``load_model`` (utils/pyt_utils.py:43-96) /
    ``init_pruned_model`` (channel_pruner.py:29-74) flows."""
    import torch  # local: export-time-only dependency

    sd: Dict[str, Any] = {}
    for name, p in params.items():
        if "kernel" in p:
            sd[f"{name}.weight"] = torch.from_numpy(np.ascontiguousarray(
                np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))))
            if "bias" in p:
                sd[f"{name}.bias"] = torch.from_numpy(
                    np.asarray(p["bias"]).copy())
        elif "scale" in p:
            sd[f"{name}.weight"] = torch.from_numpy(
                np.asarray(p["scale"]).copy())
            sd[f"{name}.bias"] = torch.from_numpy(
                np.asarray(p["bias"]).copy())
    for name, s in (state or {}).items():
        sd[f"{name}.running_mean"] = torch.from_numpy(
            np.asarray(s["mean"]).copy())
        sd[f"{name}.running_var"] = torch.from_numpy(
            np.asarray(s["var"]).copy())
    return sd


def channel_cfg_to_torch(channel_cfg: Mapping[str, Any]) -> Dict:
    """channel_cfg pytree -> the reference's channel_cfg.pth schema
    (ints + torch tensors; channel_pruner.py:821-842), loadable under
    ``torch.load(weights_only=True)``."""
    import torch

    return {name: {k: (torch.from_numpy(np.ascontiguousarray(v))
                       if np.ndim(v) else int(v))
                   for k, v in entry.items()}
            for name, entry in channel_cfg.items()}


def merge_pretrained_backbone(graph: Graph, sd: Mapping[str, Any],
                              params: Dict, state: Dict,
                              backbone_prefix: str = "backbone."):
    """Overlay an ImageNet backbone checkpoint (keys without the
    ``backbone.`` prefix, reference networks/backbone/resnet.py:185-187)
    onto freshly-initialized full-model params in place."""
    sd = _unwrap(sd)
    prefixed = {backbone_prefix + k: v for k, v in sd.items()}
    new_params, new_state, report = torch_state_dict_to_graph(
        graph, prefixed, prefix="")
    n = 0
    for name, p in new_params.items():
        if name.startswith(backbone_prefix):
            params[name] = {k: np.asarray(v) for k, v in p.items()}
            n += 1
    for name, s in new_state.items():
        if name.startswith(backbone_prefix):
            state[name] = {k: np.asarray(v) for k, v in s.items()}
    log.info("merged pretrained backbone into %d layers", n)
    return params, state
