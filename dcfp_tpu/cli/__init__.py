"""CLI package.  Honors env vars BEFORE any jax backend init (they
must be applied first, so this runs at package import):

* ``DCFP_PLATFORM``        — e.g. 'cpu' to force a CPU run
* ``DCFP_NUM_CPU_DEVICES`` — virtual CPU device count (multi-chip
  debugging without hardware)
* ``DCFP_COMPILE_CACHE``   — persistent XLA compilation cache dir
  (default ``~/.cache/dcfp_tpu_xla``; set to ``0`` to disable).
  Full-recipe train steps take minutes to compile; the cache makes
  every repeat CLI invocation at the same shapes start instantly.
"""

import os

if os.environ.get("DCFP_PLATFORM") or os.environ.get(
        "DCFP_NUM_CPU_DEVICES"):
    import jax
    _p = os.environ.get("DCFP_PLATFORM")
    if _p:
        jax.config.update("jax_platforms", _p)
    _n = os.environ.get("DCFP_NUM_CPU_DEVICES")
    if _n:
        jax.config.update("jax_num_cpu_devices", int(_n))

_cache = os.environ.get("DCFP_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/dcfp_tpu_xla"))
if _cache and _cache != "0":
    import jax
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    # cache every program regardless of size/compile time
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
