import pickle

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.factors import LinearGaussianCPD, LinearGaussianCPDType
from pybnesian_tpu.models import (
    ConditionalGaussianNetwork,
    GaussianNetwork,
    GaussianNetworkType,
)
from data_gen import normal_chain_data


def readme_df():
    np.random.seed(1)
    size = 100
    a = np.random.normal(3, np.sqrt(0.5), size)
    c = -4.2 - 1.2 * a + np.random.normal(0, np.sqrt(0.75), size)
    d = 3 + 1.2 * c + np.random.normal(0, np.sqrt(0.5), size)
    e = np.random.normal(0, 1, size)
    return pd.DataFrame({"a": a, "c": c, "d": d, "e": e})


def test_readme_workflow():
    """End-to-end reference README example (README.md:200-263)."""
    gbn = GaussianNetwork(["a", "c", "d", "e"], [("a", "c"), ("c", "d")])
    assert gbn.fitted() is False
    d_cpd = LinearGaussianCPD("d", ["c"], [3, 1.2], 0.5)
    gbn.add_cpds([d_cpd])
    assert gbn.fitted() is False
    df = readme_df()
    gbn.fit(df)
    assert gbn.fitted() is True
    assert str(gbn.cpd("a")) == "[LinearGaussianCPD] P(a) = N(3.043, 0.396)"
    assert (
        str(gbn.cpd("c"))
        == "[LinearGaussianCPD] P(c | a) = N(-4.423 + -1.083*a, 0.659)"
    )
    assert str(gbn.cpd("d")) == "[LinearGaussianCPD] P(d | c) = N(3.000 + 1.200*c, 0.500)"
    assert str(gbn.cpd("e")) == "[LinearGaussianCPD] P(e) = N(-0.020, 1.144)"

    sample = gbn.sample(50, seed=0)
    ll = gbn.logl(sample)
    sll = gbn.slogl(sample)
    assert np.isclose(ll.sum(), sll)


def test_logl_is_sum_of_cpd_logls():
    df = normal_chain_data(500)
    gbn = GaussianNetwork(["a", "b", "c", "d"], [("a", "b"), ("b", "c"), ("c", "d")])
    gbn.fit(df)
    total = sum(np.asarray(gbn.cpd(n).logl(df)) for n in "abcd")
    np.testing.assert_allclose(gbn.logl(df), total)


def test_sample_recovers_structure_params():
    gbn = GaussianNetwork(["x", "y"], [("x", "y")])
    gbn.add_cpds(
        [
            LinearGaussianCPD("x", [], [1.0], 4.0),
            LinearGaussianCPD("y", ["x"], [0.5, 2.0], 1.0),
        ]
    )
    s = gbn.sample(200000, seed=0).to_pandas()
    assert abs(s["x"].mean() - 1.0) < 0.02
    assert abs(s["x"].var() - 4.0) < 0.05
    beta = np.polyfit(s["x"], s["y"], 1)
    assert abs(beta[0] - 2.0) < 0.02
    assert abs(beta[1] - 0.5) < 0.05


def test_fit_refits_changed_structure():
    df = normal_chain_data(300)
    gbn = GaussianNetwork(["a", "b", "c", "d"], [("a", "b")])
    gbn.fit(df)
    assert gbn.cpd("b").evidence() == ["a"]
    gbn.add_arc("c", "b")
    gbn.fit(df)
    assert set(gbn.cpd("b").evidence()) == {"a", "c"}


def test_structure_mutations():
    gbn = GaussianNetwork(["a", "b", "c"])
    gbn.add_arc("a", "b")
    assert gbn.has_arc("a", "b")
    gbn.flip_arc("a", "b")
    assert gbn.has_arc("b", "a")
    gbn.remove_arc("b", "a")
    assert gbn.num_arcs() == 0
    with pytest.raises(Exception):
        gbn.add_arc("a", "a")
    gbn.add_node("z")
    assert gbn.num_nodes() == 4
    gbn.remove_node("z")
    assert gbn.num_nodes() == 3


def test_homogeneous_node_type():
    gbn = GaussianNetwork(["a"])
    assert gbn.node_type("a") == LinearGaussianCPDType()
    with pytest.raises(ValueError):
        from pybnesian_tpu.factors import DiscreteFactorType

        gbn.set_node_type("a", DiscreteFactorType())


def test_save_load_with_cpds(tmp_path):
    df = readme_df()
    gbn = GaussianNetwork(["a", "c", "d", "e"], [("a", "c"), ("c", "d")])
    gbn.fit(df)
    path = str(tmp_path / "model")
    gbn.save(path, include_cpd=True)
    from pybnesian_tpu.utils.pickle import load

    loaded = load(path + ".pickle")
    assert loaded.fitted()
    np.testing.assert_allclose(loaded.logl(df), gbn.logl(df))
    # without cpds
    gbn.save(str(tmp_path / "nocpd"), include_cpd=False)
    loaded2 = load(str(tmp_path / "nocpd.pickle"))
    assert not loaded2.fitted()
    assert loaded2.arcs() == gbn.arcs()


def test_conditional_gaussian_network():
    df = normal_chain_data(1000)
    cbn = ConditionalGaussianNetwork(["c", "d"], ["a", "b"])
    cbn.add_arc("a", "c")
    cbn.add_arc("b", "c")
    cbn.add_arc("c", "d")
    cbn.fit(df)
    assert cbn.fitted()
    # logl only over non-interface nodes
    ll = cbn.logl(df)
    total = np.asarray(cbn.cpd("c").logl(df)) + np.asarray(cbn.cpd("d").logl(df))
    np.testing.assert_allclose(ll, total)
    # sampling requires evidence
    ev = df[["a", "b"]].head(200)
    s = cbn.sample(evidence=ev, seed=0).to_pandas()
    assert set(s.columns) == {"c", "d"}
    s2 = cbn.sample(evidence=ev, concat_evidence=True, seed=0).to_pandas()
    assert set(s2.columns) == {"a", "b", "c", "d"}


def test_conditional_bn_conversion():
    gbn = GaussianNetwork(["a", "b", "c"], [("a", "b"), ("b", "c")])
    cbn = gbn.conditional_bn(["b", "c"], ["a"])
    assert set(cbn.interface_nodes()) == {"a"}
    assert cbn.num_nodes() == 2
    assert ("a", "b") in cbn.arcs()
    back = cbn.unconditional_bn()
    assert back.num_nodes() == 3


def test_type_identity_and_pickle():
    t = GaussianNetworkType()
    assert t == GaussianNetworkType()
    assert pickle.loads(pickle.dumps(t)) == t
