"""Native-core build/load helper shared by every compiled component
(graph closure, discrete scoring, benchmark baselines).

Staleness is decided by a CONTENT hash of the source stored next to the
library — git checkouts do not preserve mtimes, so an mtime comparison
would happily load a stale (or foreign-ISA) binary after a fresh clone.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

__all__ = ["build_and_load"]


def build_and_load(src_path: str, lib_path: str | None = None):
    """Compile ``src_path`` to a shared library (g++ -O3 -march=native) if
    its content hash changed, then ``ctypes.CDLL`` it. Returns the loaded
    library, or raises on toolchain failure (callers decide whether a
    numpy fallback exists)."""
    if lib_path is None:
        base, _ = os.path.splitext(src_path)
        name = os.path.basename(base)
        lib_path = os.path.join(os.path.dirname(src_path), f"lib{name}.so")
    stamp_path = lib_path + ".sha"
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    current = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            current = f.read().strip()
    if not os.path.exists(lib_path) or current != digest:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src_path,
             "-o", lib_path],
            check=True,
            capture_output=True,
        )
        with open(stamp_path, "w") as f:
            f.write(digest)
    return ctypes.CDLL(lib_path)
