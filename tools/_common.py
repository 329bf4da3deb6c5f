"""Shared helpers for the tools/exp_* measurement scripts."""

import os
import time

import numpy as np


def default_backbone_para(backbone: str) -> dict:
    """The recipe backbone_para the CLIs build (scripts/cs/*.sh config):
    hrnet* backbones take only the pretrained gate; resnet* the os8 +
    multi-grid Cityscapes config.  One definition so every profiling
    tool measures the same model as the recipes."""
    if backbone.startswith("hrnet"):
        return {"pretrained": False}
    return {"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128}


def setup_compile_cache() -> None:
    """Point jax at the persistent compile cache (DCFP_COMPILE_CACHE;
    set to '0' to disable) so repeat tool runs skip recompiles.  Call
    right after ``import jax``, before the first compilation."""
    import jax
    cache = os.environ.get("DCFP_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/dcfp_tpu_xla"))
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.1)


def sync(x):
    """Synchronize by fetching one element to host — on the axon tunnel
    ``jax.block_until_ready`` is a no-op, so timing must fence through a
    host fetch of the final output."""
    return np.asarray(x.ravel()[0])


def bench(fn, args_, iters, warmup=5):
    """Wall-clock ms/call over ``iters`` after ``warmup`` calls,
    host-fetch synchronized (device program order serializes the rest —
    only the last output needs the fence)."""
    out = None
    for _ in range(warmup):
        out = fn(*args_)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args_)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def clear_env_compiler_options() -> None:
    """Drop an inherited DCFP_XLA_OPTIONS so A/B sweeps measure what
    they say: with the env var set, every variant (including any
    baseline) would silently compile WITH those options."""
    if os.environ.pop("DCFP_XLA_OPTIONS", None) is not None:
        print("note: ignoring inherited DCFP_XLA_OPTIONS — variants "
              "state their options explicitly", flush=True)
