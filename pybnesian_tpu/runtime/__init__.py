from .config import (
    RuntimeConfig,
    default_mesh,
    device_info,
    dtype_policy,
    set_dtype_policy,
    trace,
)
from .checkpoint import load_pytree, nuts_checkpointed, save_pytree
from . import distributed

__all__ = [
    "RuntimeConfig",
    "device_info",
    "default_mesh",
    "dtype_policy",
    "set_dtype_policy",
    "trace",
    "save_pytree",
    "load_pytree",
    "nuts_checkpointed",
    "distributed",
]
