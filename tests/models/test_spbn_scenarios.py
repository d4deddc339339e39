"""Behavior-port of the reference's SemiparametricBN node-type lifecycle
scenarios (tests/models/SemiparametricBN_test.py:99-204): UnknownFactorType
defaults, set_node_type invalidating stored CPDs, add_cpds type conflicts
and type adoption, unfitted CPD storage.
"""

import pytest

from data_gen import normal_chain_data
import pybnesian_tpu as pbn

DF = normal_chain_data(400, seed=9)


def test_default_node_types_and_set():
    spbn = pbn.SemiparametricBN(["a", "b", "c", "d"])
    assert spbn.num_nodes() == 4
    assert spbn.num_arcs() == 0
    for n in spbn.nodes():
        assert spbn.node_type(n) == pbn.UnknownFactorType()
    spbn.set_node_type("b", pbn.CKDEType())
    assert spbn.node_type("b") == pbn.CKDEType()
    spbn.set_node_type("b", pbn.LinearGaussianCPDType())
    assert spbn.node_type("b") == pbn.LinearGaussianCPDType()


def test_fit_resolves_unknown_and_set_node_type_invalidates():
    spbn = pbn.SemiparametricBN([("a", "b"), ("a", "c"), ("b", "c")])
    with pytest.raises(ValueError, match="not added"):
        spbn.cpd("a")
    spbn.fit(DF)
    for n in spbn.nodes():
        cpd = spbn.cpd(n)
        assert cpd.type() == pbn.LinearGaussianCPDType()
        assert cpd.variable() == n
        assert set(cpd.evidence()) == set(spbn.parents(n))

    spbn.set_node_type("c", pbn.CKDEType())
    with pytest.raises(ValueError, match="not added"):
        spbn.cpd("c")
    spbn.fit(DF)
    assert spbn.cpd("c").type() == pbn.CKDEType()


def test_declared_ckde_node_fit():
    spbn = pbn.SemiparametricBN(
        [("a", "b"), ("a", "c"), ("b", "c")], [("c", pbn.CKDEType())]
    )
    spbn.fit(DF)
    assert spbn.cpd("a").type() == pbn.LinearGaussianCPDType()
    assert spbn.cpd("c").type() == pbn.CKDEType()
    for n in spbn.nodes():
        assert spbn.cpd(n).fitted()


def test_add_cpds_type_rules():
    spbn = pbn.SemiparametricBN([("a", "b")], [("b", pbn.CKDEType())])
    # conflicting type for a declared node raises
    with pytest.raises(ValueError, match="expects type"):
        spbn.add_cpds([pbn.LinearGaussianCPD("b", ["a"])])
    # adding a CPD to an Unknown node adopts its type
    assert spbn.node_type("a") == pbn.UnknownFactorType()
    spbn.add_cpds([pbn.CKDE("a", [])])
    assert spbn.node_type("a") == pbn.CKDEType()
    # unfitted CPDs are stored unfitted
    ck = pbn.CKDE("b", ["a"])
    assert not ck.fitted()
    spbn.add_cpds([ck])
    assert not spbn.cpd("b").fitted()
    # resetting a node to Unknown drops its stored CPD
    spbn.set_node_type("a", pbn.UnknownFactorType())
    with pytest.raises(ValueError, match="not added"):
        spbn.cpd("a")
