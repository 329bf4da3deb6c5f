"""Checkpoint IO: snapshots, resume, prune artifacts.

Replaces the reference's ``torch.save(state_dict)`` snapshots
(train.py:278-288) and the non-strict ``load_model`` with
missing/unexpected-key logging (utils/pyt_utils.py:43-96).  Everything is
a pytree of numpy arrays serialized to msgpack (flax.serialization), so
artifacts are framework-portable and mmap-free:

* ``<snapshot_dir>/<DS>_scenes_<iter>.msgpack`` — full TrainState
  (params, BN stats, optimizer state, EIC, step) for exact resume;
* ``score.msgpack``        — EIC scores (reference score.pth);
* ``channel_cfg.msgpack``  — pruned-width config (channel_cfg.pth);
* ``pruned.msgpack``       — pruned params+state (pruned.pth).

Writes are atomic (tmp + rename) so a preempted job never leaves a
truncated snapshot — the failure-recovery story the reference lacks
(SURVEY.md §5: recovery is manual).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from dcfp_tpu.utils.logger import get_logger

log = get_logger()


# ---------------------------------------------------------------------------
# low-level pytree IO
# ---------------------------------------------------------------------------

def _host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_host(tree)))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    log.info("saved %s (%.1f MB)", path, len(blob) / 1e6)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# ---------------------------------------------------------------------------
# reference (.pth) artifact interop
# ---------------------------------------------------------------------------
# Every loader below also accepts the reference's torch artifacts, so a
# user switching from wzx99/DCFP can point the CLIs straight at their
# existing files: full/pruned model checkpoints (train.py:278-282,
# prune.py:97), channel_cfg.pth (channel_pruner.py:821-842 — the same
# schema this framework exports), and score.pth ({'eic': {bn: tensor}},
# dcfp_pruner.py:25-26).  torch is a conversion-time-only dependency.

def _is_torch_file(path: str) -> bool:
    return path.endswith((".pth", ".pt"))


def _torch_load(path: str):
    """Load a reference ``.pth`` artifact safely.

    ``weights_only=True`` first: every reference artifact we interop with
    (state_dicts, score.pth, channel_cfg.pth, pruned.pth) is a plain
    container of tensors/ints, so the restricted unpickler suffices.  The
    unrestricted path executes arbitrary pickle code and is only enabled
    by the explicit opt-in env ``DCFP_UNSAFE_TORCH_LOAD=1`` (for exotic
    third-party files), with a warning."""
    import torch  # local: only needed when reading reference artifacts
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError subclass in torch>=2.4
        if os.environ.get("DCFP_UNSAFE_TORCH_LOAD") != "1":
            raise RuntimeError(
                f"{path} is not loadable with torch weights_only=True "
                f"({e}).  If you trust this file, set "
                "DCFP_UNSAFE_TORCH_LOAD=1 to allow full unpickling "
                "(executes arbitrary code from the file).") from e
        log.warning("DCFP_UNSAFE_TORCH_LOAD=1: unpickling %s without "
                    "weights_only protection", path)
        return torch.load(path, map_location="cpu", weights_only=False)


def _torch_trees(sd, params_template: Any, state_template: Any):
    """Reference state_dict -> (params, state) trees shaped like the
    templates.  Name-driven: graph node names equal reference module
    paths, conv kernels transpose OIHW->HWIO (models/convert.py does the
    same for graphs; this variant only needs the param templates)."""
    from dcfp_tpu.models.convert import _to_np, _unwrap
    sd = dict(_unwrap(sd))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for name, leaf in (params_template or {}).items():
        if "kernel" in leaf:
            w = sd.get(f"{name}.weight")
            if w is None:
                continue
            entry = {"kernel": np.ascontiguousarray(np.transpose(
                _to_np(w), (2, 3, 1, 0)).astype(np.float32))}
            b = sd.get(f"{name}.bias")
            if "bias" in leaf and b is not None:
                entry["bias"] = _to_np(b).astype(np.float32)
            params[name] = entry
        elif "scale" in leaf:
            w, b = sd.get(f"{name}.weight"), sd.get(f"{name}.bias")
            if w is None:
                continue
            params[name] = {"scale": _to_np(w).astype(np.float32),
                            "bias": _to_np(b).astype(np.float32)}
    for name in (state_template or {}):
        rm = sd.get(f"{name}.running_mean")
        rv = sd.get(f"{name}.running_var")
        if rm is not None:
            state[name] = {"mean": _to_np(rm).astype(np.float32),
                           "var": _to_np(rv).astype(np.float32)}
    return params, state


# ---------------------------------------------------------------------------
# strict resume (TrainState round-trip)
# ---------------------------------------------------------------------------

def save_train_state(path: str, state) -> None:
    save_pytree(path, state)


def load_train_state(path: str, template):
    """Exact-structure restore into a freshly-built TrainState."""
    return serialization.from_state_dict(template, load_pytree(path))


# ---------------------------------------------------------------------------
# non-strict param loading (utils/pyt_utils.py:43-96 parity)
# ---------------------------------------------------------------------------

def _flat(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}{k}/"))
    elif tree is not None:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflat_into(template: Any, flat: Dict[str, np.ndarray],
                 prefix: str = ""):
    if isinstance(template, dict):
        return {k: _unflat_into(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    key = prefix.rstrip("/")
    return flat.get(key, template)


def merge_params(template: Any, loaded: Any
                 ) -> Tuple[Any, List[str], List[str]]:
    """Copy every leaf of ``loaded`` whose path and shape match
    ``template``; keep template values elsewhere.  Returns
    (merged, missing_keys, unexpected_keys) and logs the diff, mirroring
    the reference's non-strict load."""
    t_flat, l_flat = _flat(template), _flat(loaded)
    merged: Dict[str, np.ndarray] = {}
    missing, unexpected = [], []
    for k, tv in t_flat.items():
        lv = l_flat.get(k)
        if lv is None:
            missing.append(k)
        elif tuple(np.shape(lv)) != tuple(np.shape(tv)):
            missing.append(f"{k} (shape {np.shape(lv)} != {np.shape(tv)})")
        else:
            merged[k] = lv
    unexpected = [k for k in l_flat if k not in t_flat]
    if missing:
        log.warning("missing keys in checkpoint: %s",
                    ", ".join(missing[:20]) +
                    (" ..." if len(missing) > 20 else ""))
    if unexpected:
        log.warning("unexpected keys in checkpoint: %s",
                    ", ".join(unexpected[:20]) +
                    (" ..." if len(unexpected) > 20 else ""))
    return _unflat_into(template, merged), missing, unexpected


def load_params_non_strict(path: str, params_template: Any,
                           state_template: Optional[Any] = None):
    """Load a snapshot or bare params file into (params, bn_state)
    templates.  Accepts full TrainState snapshots (uses their
    params/bn_state entries), pruned.msgpack ({'params','state'}), a
    bare params tree, or a reference torch ``.pth`` checkpoint
    (auto-converted by module-path name)."""
    if _is_torch_file(path):
        loaded_params, loaded_state = _torch_trees(
            _torch_load(path), params_template, state_template)
        log.info("converted reference checkpoint %s (%d param nodes)",
                 path, len(loaded_params))
    else:
        raw = load_pytree(path)
        if isinstance(raw, dict) and "params" in raw:
            loaded_params = raw["params"]
            loaded_state = raw.get("bn_state", raw.get("state"))
        else:
            loaded_params, loaded_state = raw, None
    params, _, _ = merge_params(params_template, loaded_params)
    if state_template is not None and loaded_state is not None:
        bn_state, _, _ = merge_params(state_template, loaded_state)
        return params, bn_state
    return params, state_template


# ---------------------------------------------------------------------------
# prune artifacts
# ---------------------------------------------------------------------------

def save_eic(path: str, eic: Dict[str, np.ndarray]) -> None:
    save_pytree(path, dict(eic))


def load_eic(path: str) -> Dict[str, np.ndarray]:
    if _is_torch_file(path):
        from dcfp_tpu.models.convert import _to_np
        blob = _torch_load(path)
        eic = blob.get("eic", blob)  # reference: {'eic': {bn: tensor}}
        return {k: _to_np(v).astype(np.float32) for k, v in eic.items()}
    return {k: np.asarray(v) for k, v in load_pytree(path).items()}


def _torch_save(path: str, obj) -> None:
    import torch
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(obj, tmp)
    os.replace(tmp, path)
    log.info("saved %s (torch format)", path)


def save_channel_cfg(path: str, channel_cfg: Dict) -> None:
    """A ``.pth`` path writes the reference's own channel_cfg schema so
    the artifact feeds straight back into the reference's
    ``init_pruned_model`` (channel_pruner.py:29-74)."""
    if _is_torch_file(path):
        from dcfp_tpu.models.convert import channel_cfg_to_torch
        _torch_save(path, channel_cfg_to_torch(channel_cfg))
        return
    save_pytree(path, channel_cfg)


def load_channel_cfg(path: str) -> Dict:
    if _is_torch_file(path):
        from dcfp_tpu.models.convert import _to_np
        cfg = {name: {k: (v if isinstance(v, int) else _to_np(v))
                      for k, v in entry.items()}
               for name, entry in _torch_load(path).items()}
    else:
        cfg = load_pytree(path)
    out = {}
    for name, entry in cfg.items():
        out[name] = {k: (int(v) if np.ndim(v) == 0 else np.asarray(v))
                     for k, v in entry.items()}
    return out


def save_pruned(path: str, params: Any, state: Any) -> None:
    """A ``.pth`` path writes a reference-format torch state_dict
    (consumed by the reference's load_model after init_pruned_model)."""
    if _is_torch_file(path):
        from dcfp_tpu.models.convert import to_torch_state_dict
        _torch_save(path, to_torch_state_dict(params, state))
        return
    save_pytree(path, {"params": params, "state": state})


def load_pruned(path: str) -> Tuple[Any, Any]:
    blob = load_pytree(path)
    return blob["params"], blob["state"]
