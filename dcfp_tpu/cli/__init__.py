"""CLI package.  Honors two env vars BEFORE any jax backend init (they
must be applied first, so this runs at package import):

* ``DCFP_PLATFORM``        — e.g. 'cpu' to force a CPU run
* ``DCFP_NUM_CPU_DEVICES`` — virtual CPU device count (multi-chip
  debugging without hardware)
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
