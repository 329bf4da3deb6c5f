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
    params/bn_state entries), pruned.msgpack ({'params','state'}), or a
    bare params tree."""
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
    return {k: np.asarray(v) for k, v in load_pytree(path).items()}


def save_channel_cfg(path: str, channel_cfg: Dict) -> None:
    save_pytree(path, channel_cfg)


def load_channel_cfg(path: str) -> Dict:
    cfg = load_pytree(path)
    out = {}
    for name, entry in cfg.items():
        out[name] = {k: (int(v) if np.ndim(v) == 0 else np.asarray(v))
                     for k, v in entry.items()}
    return out


def save_pruned(path: str, params: Any, state: Any) -> None:
    save_pytree(path, {"params": params, "state": state})


def load_pruned(path: str) -> Tuple[Any, Any]:
    blob = load_pytree(path)
    return blob["params"], blob["state"]
