"""Run the reference PyBNesian test suite against pybnesian_tpu.

Copies /root/reference/tests into a temp sandbox (the reference code never
enters this repo), installs an import shim mapping ``pybnesian`` to
``pybnesian_tpu``, and runs pytest. All 131 reference tests are expected to
pass (see PARITY.md).

Usage: python tools/run_reference_suite.py [extra pytest args]
"""

import os
import shutil
import subprocess
import sys
import tempfile

REFERENCE_TESTS = "/root/reference/tests"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFTEST = """\
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests", "helpers"))
import pybnesian_tpu
pybnesian_tpu.install_as_pybnesian()
"""


def main() -> int:
    if not os.path.isdir(REFERENCE_TESTS):
        print(f"reference tests not found at {REFERENCE_TESTS}", file=sys.stderr)
        return 2
    sandbox = tempfile.mkdtemp(prefix="refparity_")
    try:
        shutil.copytree(REFERENCE_TESTS, os.path.join(sandbox, "tests"))
        with open(os.path.join(sandbox, "conftest.py"), "w") as f:
            f.write(CONFTEST.format(repo=REPO))
        cmd = [
            sys.executable, "-m", "pytest", "tests", "-q",
            "-p", "no:cacheprovider", *sys.argv[1:],
        ]
        return subprocess.call(cmd, cwd=sandbox)
    finally:
        shutil.rmtree(sandbox, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
