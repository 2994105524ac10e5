"""Platform selection helper for CLIs.

The environment may pre-import/pre-configure jax (e.g. a TPU tunnel sets
JAX_PLATFORMS before python starts and jax snapshots it), in which case
exporting ``JAX_PLATFORMS=cpu`` for a single run has no effect.  Calling
:func:`apply_env_platform` early re-applies the *current* environment
value through ``jax.config`` — which still works as long as no backend
has been initialized — so ``JAX_PLATFORMS=cpu python examples/amg.py``
behaves as expected.  Also enables the persistent compile cache used by
the test suite (XLA compiles are slow on small hosts and very slow over
TPU tunnels).
"""

from __future__ import annotations

import os

import jax


def apply_env_platform(cache_dir: str = "/tmp/tpu_amg_jax_cache") -> None:
    cache_dir = os.environ.get("TPU_AMG_CACHE_DIR", cache_dir)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        # keep the host cpu backend registered alongside the accelerator
        # (first entry stays the default): setup_on_host pins the f64
        # setup phase to it on small-HBM/tunneled devices
        if "cpu" not in plat.split(","):
            plat = plat + ",cpu"
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized; nothing to do
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
