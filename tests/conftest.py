"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run anywhere (SURVEY.md §4.5)."""

import os

# Force CPU for unit tests: the session environment may point JAX at a
# remote TPU (JAX_PLATFORMS=axon), which is far too slow for thousands of
# tiny test ops. Benchmarks (bench.py) use the real device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may be pre-imported by the environment (so the env vars above were
# read too late); config updates below still apply as long as no backend
# has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# XLA compiles are slow on small build machines; persist them so repeated
# test runs reuse compiled executables across processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
