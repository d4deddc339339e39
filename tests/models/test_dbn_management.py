"""DynamicBayesianNetwork variable management + persistence scenarios
(reference tests/models/DynamicBayesianNetwork_test.py style,
re-expressed)."""

import numpy as np
import pandas as pd

import pybnesian_tpu as pbn

from data_gen import normal_chain_data


def test_dbn_variable_management():
    dbn = pbn.DynamicGaussianNetwork(["a", "b"], 2)
    assert dbn.markovian_order() == 2
    assert dbn.variables() == ["a", "b"]
    dbn.add_variable("c")
    assert dbn.contains_variable("c")
    assert "c_t_1" in dbn.static_bn().nodes()
    dbn.remove_variable("c")
    assert not dbn.contains_variable("c")
    assert "c_t_1" not in dbn.static_bn().nodes()


def test_dbn_save_load_include_cpd(tmp_path):
    rng = np.random.default_rng(0)
    n = 150
    ts = pd.DataFrame(
        {"a": rng.normal(size=n), "b": rng.normal(size=n)}
    )
    dbn = pbn.DynamicGaussianNetwork(["a", "b"], 1)
    dbn.fit(ts)
    path = str(tmp_path / "dbn.pkl")
    dbn.save(path, include_cpd=True)
    d2 = pbn.load(path)
    assert d2.fitted()
    np.testing.assert_allclose(d2.slogl(ts), dbn.slogl(ts), rtol=1e-9)
    # without CPDs: structure survives, parameters do not
    path2 = str(tmp_path / "dbn_nocpd.pkl")
    dbn.save(path2, include_cpd=False)
    d3 = pbn.load(path2)
    assert not d3.fitted()
    assert d3.variables() == dbn.variables()


def test_dbn_logl_routing():
    """First markovian_order rows route to the static BN, the rest to the
    transition BN (reference DynamicBayesianNetwork.cpp logl)."""
    rng = np.random.default_rng(1)
    n = 120
    ts = pd.DataFrame({"a": rng.normal(size=n), "b": rng.normal(size=n)})
    m = 2
    dbn = pbn.DynamicGaussianNetwork(["a", "b"], m)
    dbn.fit(ts)
    test = pd.DataFrame(
        {"a": rng.normal(size=30), "b": rng.normal(size=30)}
    )
    ll = dbn.logl(test)
    assert len(ll) == 30
    assert np.isclose(dbn.slogl(test), np.nansum(ll), rtol=1e-8)
