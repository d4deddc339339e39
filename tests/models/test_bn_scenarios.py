"""Behavior-port of the reference's BayesianNetwork_test.py scenarios
(tests/models/BayesianNetwork_test.py:221-349): cpd() lifecycle and error
messages, add_cpds validation, logl decomposition, and the sample()
ordered/seed contract.
"""

import numpy as np
import pytest

from data_gen import normal_chain_data
from pybnesian_tpu.factors.lineargaussian import LinearGaussianCPD
from pybnesian_tpu.models import GaussianNetwork

DF = normal_chain_data(1500, seed=5)
ARCS = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]


def test_cpd_not_added_message():
    gbn = GaussianNetwork(ARCS)
    with pytest.raises(ValueError) as ex:
        gbn.cpd("a")
    assert 'CPD of variable "a" not added. Call add_cpds() or fit()' in str(
        ex.value
    )


def test_fit_assigns_cpds_and_is_stale_after_mutation():
    gbn = GaussianNetwork(ARCS)
    gbn.fit(DF)
    for n in gbn.nodes():
        cpd = gbn.cpd(n)
        assert cpd.variable() == n
        assert cpd.evidence() == gbn.parents(n)

    gbn.remove_arc("a", "b")
    # reference keeps the stale CPD until the next fit
    assert gbn.cpd("b").evidence() != gbn.parents("b")
    gbn.fit(DF)
    assert gbn.cpd("b").evidence() == gbn.parents("b")


def test_add_cpds_validation_messages():
    gbn = GaussianNetwork(ARCS)
    with pytest.raises(ValueError, match="variable which is not present"):
        gbn.add_cpds([LinearGaussianCPD("e", [])])
    with pytest.raises(ValueError, match="Evidence variable"):
        gbn.add_cpds([LinearGaussianCPD("a", ["e"])])
    for bad in (
        LinearGaussianCPD("a", ["b"]),
        LinearGaussianCPD("b", []),
        LinearGaussianCPD("b", ["c"]),
    ):
        with pytest.raises(
            ValueError, match="CPD do not have the model's parent set"
        ):
            gbn.add_cpds([bad])

    lg = LinearGaussianCPD("b", ["a"], [2.5, 1.65], 4)
    assert lg.fitted()
    gbn.add_cpds([lg])
    cpd_b = gbn.cpd("b")
    assert cpd_b.variable() == "b"
    assert cpd_b.evidence() == ["a"]
    assert cpd_b.fitted()
    np.testing.assert_array_equal(cpd_b.beta, [2.5, 1.65])
    assert cpd_b.variance == 4
    # other CPDs still absent
    for other in ("a", "c", "d"):
        with pytest.raises(ValueError, match="not added"):
            gbn.cpd(other)


def test_logl_decomposes_over_cpds():
    gbn = GaussianNetwork(ARCS)
    gbn.fit(DF)
    test_df = normal_chain_data(800, seed=6)
    ll = gbn.logl(test_df)
    sll = gbn.slogl(test_df)
    total = np.zeros(len(test_df))
    for n in gbn.nodes():
        cpd = gbn.cpd(n)
        l = cpd.logl(test_df)
        assert cpd.slogl(test_df) == pytest.approx(l.sum(), rel=1e-9)
        total += l
    np.testing.assert_allclose(ll, total, rtol=1e-9)
    assert sll == pytest.approx(ll.sum(), rel=1e-9)


def test_sample_ordered_contract():
    gbn = GaussianNetwork(["a", "c", "b", "d"], ARCS)
    gbn.fit(DF)
    sample = gbn.sample(500, 0, False)
    assert sample.schema.names == ["a", "b", "c", "d"]  # topological
    assert sample.num_rows == 500
    ordered = gbn.sample(500, 0, True)
    assert ordered.schema.names == ["a", "c", "b", "d"]  # insertion order
    # same seed: identical values per variable, independent of ordering
    assert sample.column(0).equals(ordered.column(0))
    assert sample.column(1).equals(ordered.column(2))
    assert sample.column(2).equals(ordered.column(1))
    assert sample.column(3).equals(ordered.column(3))
    other = gbn.sample(500, 1, False)
    assert not sample.column(0).equals(other.column(0))
