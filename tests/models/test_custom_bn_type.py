"""Python-defined BayesianNetworkType extension contract (reference
tests/models/BayesianNetwork_type_test.py scenarios, rebuilt): per-class
equality semantics, can_have_arc policy enforcement in the graph layer and
in hill-climbing, specific-network subclasses, and pickling."""

import pickle

import pytest

import pybnesian_tpu as pbn
from data_gen import normal_indep_data


class ArcsFromAType(pbn.BayesianNetworkType):
    """Only arcs whose source is 'a' are legal."""

    def is_homogeneous(self):
        return True

    def default_node_type(self):
        return pbn.LinearGaussianCPDType()

    def can_have_arc(self, model, source, target):
        return source == "a"

    def ToString(self):
        return "ArcsFromAType"


class OtherCustomType(pbn.BayesianNetworkType):
    def is_homogeneous(self):
        return True

    def default_node_type(self):
        return pbn.LinearGaussianCPDType()


class SpecificNetwork(pbn.BayesianNetwork):
    def __init__(self, variables, arcs=None):
        if arcs is None:
            super().__init__(ArcsFromAType(), variables)
        else:
            super().__init__(ArcsFromAType(), variables, arcs)


class ConditionalSpecificNetwork(pbn.ConditionalBayesianNetwork):
    def __init__(self, variables, interface, arcs=None):
        if arcs is None:
            super().__init__(ArcsFromAType(), variables, interface)
        else:
            super().__init__(ArcsFromAType(), variables, interface, arcs)


def test_builtin_type_identity():
    assert pbn.GaussianNetwork(["x"]).type() == pbn.GaussianNetworkType()
    assert pbn.KDENetwork(["x"]).type() == pbn.KDENetworkType()
    assert pbn.SemiparametricBN(["x"]).type() == pbn.SemiparametricBNType()
    assert pbn.GaussianNetworkType() != pbn.KDENetworkType()


def test_custom_type_equality_per_class():
    assert ArcsFromAType() == ArcsFromAType()
    assert OtherCustomType() == OtherCustomType()
    assert ArcsFromAType() != OtherCustomType()
    assert ArcsFromAType() != pbn.GaussianNetworkType()
    assert hash(ArcsFromAType()) == hash(ArcsFromAType())


def test_custom_type_arc_policy():
    bn = pbn.BayesianNetwork(ArcsFromAType(), ["a", "b", "c", "d"])
    assert bn.can_add_arc("a", "b")
    assert not bn.can_add_arc("b", "a")
    assert not bn.can_add_arc("c", "d")


def test_specific_network_subclass():
    sp1 = SpecificNetwork(["a", "b", "c", "d"])
    sp2 = SpecificNetwork(["a", "b", "c", "d"], [("a", "b")])
    assert sp1.type() == sp2.type()
    assert sp1.num_arcs() == 0
    assert sp2.arcs() == [("a", "b")]
    assert not sp1.can_add_arc("c", "a")


def test_hc_respects_custom_arc_policy():
    df = normal_indep_data(1000)
    start = SpecificNetwork(["a", "b", "c", "d"])
    est = pbn.GreedyHillClimbing().estimate(
        pbn.ArcOperatorSet(), pbn.BIC(df), start
    )
    assert est.type() == start.type()
    assert all(s == "a" for s, _ in est.arcs())


def test_conditional_specific_network():
    csp1 = ConditionalSpecificNetwork(["a", "b"], ["c", "d"])
    csp2 = ConditionalSpecificNetwork(["a", "b"], ["c", "d"], [("a", "b")])
    assert csp1.type() == csp2.type()
    assert csp1.can_add_arc("a", "b")
    assert not csp1.can_add_arc("b", "a")
    assert not csp1.can_add_arc("c", "d")
    assert csp2.arcs() == [("a", "b")]


def test_hc_conditional_custom_type():
    df = normal_indep_data(1000)
    cstart = ConditionalSpecificNetwork(["a", "c"], ["b", "d"])
    est = pbn.GreedyHillClimbing().estimate(
        pbn.ArcOperatorSet(), pbn.BIC(df), cstart
    )
    assert est.type() == cstart.type()
    assert all(s == "a" for s, _ in est.arcs())


def test_custom_type_and_network_pickle():
    t2 = pickle.loads(pickle.dumps(ArcsFromAType()))
    assert t2 == ArcsFromAType()
    sp = SpecificNetwork(["a", "b"], [("a", "b")])
    sp2 = pickle.loads(pickle.dumps(sp))
    assert isinstance(sp2, SpecificNetwork)
    assert sp2.arcs() == [("a", "b")]
    assert sp2.type() == ArcsFromAType()
    # the restored type keeps its policy
    assert not sp2.can_add_arc("b", "a")


def test_illegal_arc_in_constructor_raises():
    with pytest.raises(ValueError):
        SpecificNetwork(["a", "b", "c"], [("b", "c")])
