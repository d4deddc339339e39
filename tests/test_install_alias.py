"""install_as_pybnesian: the drop-in alias must map the whole module tree
to the SAME objects (no duplicated subpackages / forked singletons)."""

import subprocess
import sys

SCRIPT = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
import pybnesian_tpu
pybnesian_tpu.install_as_pybnesian()
import pybnesian
assert pybnesian is pybnesian_tpu
import pybnesian.learning
assert sys.modules["pybnesian.learning"] is sys.modules["pybnesian_tpu.learning"]
import pybnesian.factors as pf
import pybnesian_tpu.factors as tf
assert pf is tf
# singleton identity holds across both names
from pybnesian.factors import LinearGaussianCPDType as A
from pybnesian_tpu.factors import LinearGaussianCPDType as B
assert A() is B()
print("ALIAS-OK")
"""


def test_alias_module_identity():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "ALIAS-OK" in out.stdout, out.stderr
