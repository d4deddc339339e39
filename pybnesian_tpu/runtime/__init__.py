from .config import (
    RuntimeConfig,
    default_mesh,
    device_info,
    dtype_policy,
    set_dtype_policy,
    trace,
)

__all__ = [
    "RuntimeConfig",
    "device_info",
    "default_mesh",
    "dtype_policy",
    "set_dtype_policy",
    "trace",
]
