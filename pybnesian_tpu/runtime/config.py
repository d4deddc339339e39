"""Runtime configuration: device discovery, dtype policy, mesh defaults,
profiling hooks.

This module replaces the reference's ``OpenCLConfig`` singleton
(opencl/opencl_config.hpp:120-292) — which hard-coded platform 0 / device 0
and owned the kernel cache — with the JAX-native equivalents: device/mesh
discovery, a process-wide dtype policy (the reference's float/double template
split), and `jax.profiler` trace hooks (net-new; the reference has no
tracing, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import dataclasses

import numpy as np

__all__ = [
    "RuntimeConfig",
    "device_info",
    "default_mesh",
    "dtype_policy",
    "set_dtype_policy",
    "trace",
]


@dataclasses.dataclass
class RuntimeConfig:
    compute_dtype: np.dtype = np.dtype(np.float32)
    #: axis sizes for the default mesh; None = 1-D data mesh over all devices
    mesh_axes: dict | None = None


_CONFIG = RuntimeConfig()


def dtype_policy() -> np.dtype:
    """Default device compute dtype. float32 on TPU; tests enable x64 and the
    kernels follow the data dtype, so this is the fallback only."""
    return _CONFIG.compute_dtype


def set_dtype_policy(dtype) -> None:
    _CONFIG.compute_dtype = np.dtype(dtype)


def device_info() -> dict:
    """Platform/device summary (replaces OpenCLConfig's device selection)."""
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "num_devices": len(devices),
        "devices": [str(d) for d in devices],
        "process_index": jax.process_index(),
        "num_processes": jax.process_count(),
    }


def default_mesh():
    """1-D data mesh over every visible device."""
    from ..parallel import make_mesh

    import jax

    return make_mesh({"data": len(jax.devices())})


@contextlib.contextmanager
def trace(name: str, log_dir: str | None = None):
    """jax.profiler trace context; annotates the region when no log_dir is
    given, writes a full profile otherwise."""
    import jax

    if log_dir is not None:
        with jax.profiler.trace(log_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield
