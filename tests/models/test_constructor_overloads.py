"""Model constructor overload resolution — mirrors the reference's pybind11
overload set (pybindings_models.cpp:2213-2556 and the SemiparametricBN
node_types overloads :2679-2711) and the fixtures of
tests/serialization/serialize_models_test.py."""

import pickle

import pytest

import pybnesian_tpu as pbn


def test_bn_arcs_only_builds_nodes():
    m = pbn.BayesianNetwork(pbn.GaussianNetworkType(), [("a", "b"), ("b", "c")])
    assert set(m.nodes()) == {"a", "b", "c"}
    assert set(m.arcs()) == {("a", "b"), ("b", "c")}


def test_bn_graph_positional():
    g = pbn.Dag(["a", "b"], [("a", "b")])
    m = pbn.BayesianNetwork(pbn.GaussianNetworkType(), g)
    assert m.arcs() == [("a", "b")]
    m2 = pbn.GaussianNetwork(pbn.Dag(["x", "y"], [("x", "y")]))
    assert m2.arcs() == [("x", "y")]


def test_bn_node_types_positional():
    nts = [("b", pbn.CKDEType())]
    for m in (
        pbn.SemiparametricBN(["a", "b", "c", "d"], nts),
        pbn.SemiparametricBN([("a", "b")], nts),
        pbn.SemiparametricBN(["a", "b", "c", "d"], [("a", "b")], nts),
        pbn.SemiparametricBN(pbn.Dag(["a", "b"], [("a", "b")]), nts),
        pbn.BayesianNetwork(pbn.SemiparametricBNType(), ["a", "b"], nts),
        pbn.BayesianNetwork(
            pbn.SemiparametricBNType(), ["a", "b"], [("a", "b")], nts
        ),
    ):
        assert m.node_type("b") == pbn.CKDEType()
        assert m.node_type("a") == pbn.UnknownFactorType()


def test_conditional_bn_overloads():
    nts = [("c", pbn.CKDEType())]
    m = pbn.ConditionalBayesianNetwork(
        pbn.SemiparametricBNType(), ["c", "d"], ["a"], [("a", "c")], nts
    )
    assert m.node_type("c") == pbn.CKDEType()
    assert m.interface_nodes() == ["a"]
    assert m.arcs() == [("a", "c")]
    g = pbn.ConditionalDag(["c"], ["a"])
    m2 = pbn.ConditionalSemiparametricBN(g)
    assert m2.interface_nodes() == ["a"]


def test_heterogeneous_node_types_positional():
    m = pbn.HeterogeneousBN(
        [pbn.LinearGaussianCPDType()], ["a", "b"], [("b", pbn.CKDEType())]
    )
    assert m.node_type("b") == pbn.CKDEType()


def test_homogeneous_arcs_only():
    m = pbn.HomogeneousBN(pbn.LinearGaussianCPDType(), [("a", "b")])
    assert set(m.nodes()) == {"a", "b"}


def test_node_types_survive_pickle():
    m = pbn.SemiparametricBN(["a", "b", "c", "d"], [("b", pbn.CKDEType())])
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.node_types() == m.node_types()
    assert m2.node_type("b") == pbn.CKDEType()


def test_homogeneous_rejects_foreign_node_type():
    with pytest.raises(ValueError):
        pbn.GaussianNetwork(["a", "b"], [("a", "b")]).set_node_type(
            "a", pbn.CKDEType()
        )


def test_duplicate_slot_rejected():
    with pytest.raises(TypeError):
        pbn.BayesianNetwork(
            pbn.GaussianNetworkType(), [("a", "b")], [("b", "c")]
        )


def test_explicit_nodes_reject_unknown_arc_endpoints():
    """With an explicit node list, arcs may not reference other nodes
    (reference SemiparametricBN_test.py:38-40); nodes are inferred from
    arcs only in the arcs-only overload."""
    import pytest

    import pybnesian_tpu as pbn

    with pytest.raises((KeyError, ValueError), match="not present in the graph"):
        pbn.SemiparametricBN(["a", "b", "c"], [("a", "d")])
    with pytest.raises((KeyError, ValueError), match="not present in the graph"):
        pbn.GaussianNetwork(["a", "b"], [("a", "x")])
    # arcs-only still infers nodes
    m = pbn.GaussianNetwork([("a", "c"), ("b", "c")])
    assert sorted(m.nodes()) == ["a", "b", "c"]
