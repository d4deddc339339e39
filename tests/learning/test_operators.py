"""Operator and operator-set semantics (reference
tests/learning/operators/*_test.py scenarios)."""

import numpy as np
import pytest

import pybnesian_tpu as pbn
from data_gen import normal_chain_data

df = normal_chain_data(1000)


def test_operator_create_accessors():
    o = pbn.AddArc("a", "b", 1)
    assert (o.source(), o.target(), o.delta()) == ("a", "b", 1)
    o = pbn.RemoveArc("a", "b", 2)
    assert (o.source(), o.target(), o.delta()) == ("a", "b", 2)
    o = pbn.FlipArc("a", "b", 3)
    assert (o.source(), o.target(), o.delta()) == ("a", "b", 3)
    o = pbn.ChangeNodeType("a", pbn.CKDEType(), 4)
    assert o.node() == "a"
    assert o.node_type() == pbn.CKDEType()
    assert o.delta() == 4


def test_operator_apply():
    gbn = pbn.GaussianNetwork(["a", "b", "c", "d"])
    pbn.AddArc("a", "b", 1).apply(gbn)
    assert gbn.num_arcs() == 1 and gbn.has_arc("a", "b")
    pbn.FlipArc("a", "b", 1).apply(gbn)
    assert gbn.num_arcs() == 1 and gbn.has_arc("b", "a")
    pbn.RemoveArc("b", "a", 1).apply(gbn)
    assert gbn.num_arcs() == 0

    with pytest.raises(ValueError, match="[Ww]rong factor type"):
        pbn.ChangeNodeType("a", pbn.CKDEType(), 1).apply(gbn)

    spbn = pbn.SemiparametricBN(["a", "b", "c", "d"])
    assert spbn.node_type("a") == pbn.UnknownFactorType()
    pbn.ChangeNodeType("a", pbn.CKDEType(), 1).apply(spbn)
    assert spbn.node_type("a") == pbn.CKDEType()
    pbn.AddArc("a", "b", 1).apply(spbn)
    pbn.FlipArc("a", "b", 1).apply(spbn)
    assert spbn.has_arc("b", "a") and not spbn.has_arc("a", "b")
    pbn.RemoveArc("b", "a", 1).apply(spbn)
    assert spbn.num_arcs() == 0


def test_operator_opposite():
    bn = pbn.SemiparametricBN(["a", "b"])
    opp = pbn.AddArc("a", "b", 1).opposite(bn)
    assert isinstance(opp, pbn.RemoveArc)
    assert (opp.source(), opp.target(), opp.delta()) == ("a", "b", -1)
    opp = pbn.RemoveArc("a", "b", 1).opposite(bn)
    assert isinstance(opp, pbn.AddArc)
    assert (opp.source(), opp.target(), opp.delta()) == ("a", "b", -1)
    opp = pbn.FlipArc("a", "b", 1).opposite(bn)
    assert isinstance(opp, pbn.FlipArc)
    assert (opp.source(), opp.target(), opp.delta()) == ("b", "a", -1)

    bn.set_node_type("a", pbn.LinearGaussianCPDType())
    opp = pbn.ChangeNodeType("a", pbn.CKDEType(), 1).opposite(bn)
    assert isinstance(opp, pbn.ChangeNodeType)
    assert opp.node() == "a"
    assert opp.node_type() == pbn.LinearGaussianCPDType()
    assert opp.delta() == -1


def test_operator_tabu_set():
    tabu = pbn.OperatorTabuSet()
    assert tabu.empty()
    assert not tabu.contains(pbn.AddArc("a", "b", 1))
    tabu.insert(pbn.AddArc("a", "b", 2))
    assert not tabu.empty()
    # identity ignores the delta
    assert tabu.contains(pbn.AddArc("a", "b", 3))
    assert not tabu.contains(pbn.RemoveArc("b", "c", 4))
    tabu.insert(pbn.RemoveArc("b", "c", 5))
    assert tabu.contains(pbn.RemoveArc("b", "c", 6))
    tabu.clear()
    assert tabu.empty()


def test_change_node_type_set_requires_heterogeneous():
    gbn = pbn.GaussianNetwork(["a", "b", "c", "d"])
    cv = pbn.CVLikelihood(df)
    with pytest.raises(ValueError, match="non-homogeneous"):
        pbn.ChangeNodeTypeSet().cache_scores(gbn, cv)


def test_arc_set_unknown_restriction_nodes():
    gbn = pbn.GaussianNetwork(["a", "b", "c", "d"])
    bic = pbn.BIC(df)

    arc_op = pbn.ArcOperatorSet()
    arc_op.set_arc_blacklist([("b", "a")])
    arc_op.set_arc_whitelist([("b", "c")])
    arc_op.set_max_indegree(3)
    arc_op.cache_scores(gbn, bic)  # valid names: fine

    arc_op.set_arc_blacklist([("e", "a")])
    with pytest.raises(ValueError, match="not present in the graph"):
        arc_op.cache_scores(gbn, bic)

    arc_op.set_arc_blacklist([])
    arc_op.set_arc_whitelist([("e", "a")])
    with pytest.raises(ValueError, match="not present in the graph"):
        arc_op.cache_scores(gbn, bic)


def test_arc_set_max_delta_matches_local_scores():
    gbn = pbn.GaussianNetwork(["c", "d"])
    bic = pbn.BIC(df)
    arc_op = pbn.ArcOperatorSet()
    arc_op.cache_scores(gbn, bic)
    op = arc_op.find_max(gbn)
    expected = bic.local_score(gbn, "d", ["c"]) - bic.local_score(gbn, "d")
    # BIC is score-equivalent: both directions have the same delta, so only
    # check magnitude
    assert np.isclose(op.delta(), expected, atol=1e-6)

    # blacklisting the winner yields the reverse arc with the same delta
    arc_op.set_arc_blacklist([(op.source(), op.target())])
    arc_op.cache_scores(gbn, bic)
    op2 = arc_op.find_max(gbn)
    assert (op2.source(), op2.target()) == (op.target(), op.source())
    assert isinstance(op, pbn.AddArc) and isinstance(op2, pbn.AddArc)


def test_arc_set_nomax():
    gbn = pbn.GaussianNetwork(["a", "b"])
    bic = pbn.BIC(df)
    arc_op = pbn.ArcOperatorSet(whitelist=[("a", "b")])
    arc_op.cache_scores(gbn, bic)
    assert arc_op.find_max(gbn) is None


def test_pool_create_and_find_max():
    with pytest.raises(ValueError, match="cannot be empty"):
        pbn.OperatorPool([])

    spbn = pbn.SemiparametricBN(["a", "b", "c", "d"])
    cv = pbn.CVLikelihood(df)
    arcs = pbn.ArcOperatorSet()
    node_type = pbn.ChangeNodeTypeSet()
    arcs.cache_scores(spbn, cv)
    spbn.set_unknown_node_types(df)
    node_type.cache_scores(spbn, cv)
    arcs_max = arcs.find_max(spbn)
    node_max = node_type.find_max(spbn)

    pool = pbn.OperatorPool([arcs, node_type])
    pool.cache_scores(spbn, cv)
    combined = pool.find_max(spbn)
    best = arcs_max if arcs_max.delta() >= node_max.delta() else node_max
    assert combined == best
    assert np.isclose(combined.delta(), best.delta())
