import os
import sys

# Tests run on a virtual multi-device CPU mesh: fast, deterministic, and lets
# sharding tests exercise 8 devices without TPU hardware.
#
# NOTE: this environment injects a TPU plugin via sitecustomize, which imports
# jax before conftest runs — env vars set here are too late. jax.config.update
# works because the backend initializes lazily on first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA CPU compiles of the vmapped kernels take
# seconds each; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
