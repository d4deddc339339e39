"""Restriction-validation semantics (reference util/validate_whitelists.hpp
:72-227 and its use in pc.cpp:277, mmpc.cpp:1006, hillclimbing.hpp:296,
operators.cpp:31)."""

import numpy as np
import pytest

from data_gen import normal_chain_data
from pybnesian_tpu.graph import PartiallyDirectedGraph
from pybnesian_tpu.learning.algorithms import hc
from pybnesian_tpu.learning.algorithms.mmpc import MMPC
from pybnesian_tpu.learning.algorithms.pc import PC
from pybnesian_tpu.learning.independences import LinearCorrelation
from pybnesian_tpu.learning.operators import ArcOperatorSet
from pybnesian_tpu.learning.scores import BIC
from pybnesian_tpu.models import GaussianNetwork
from pybnesian_tpu.utils.validate import (
    validate_arc_restrictions,
    validate_restrictions,
    validate_type_restrictions,
)


def _graph(names=("a", "b", "c", "d")):
    return PartiallyDirectedGraph(list(names))


# --------------------------------------------------------- normalization
def test_double_arc_blacklist_becomes_edge_blacklist():
    r = validate_restrictions(
        _graph(), arc_blacklist=[("a", "b"), ("b", "a")]
    )
    assert r.arc_blacklist == set()
    assert r.edge_blacklist == {frozenset(("a", "b"))}


def test_arc_blacklist_and_whitelist_conflict_raises():
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        validate_restrictions(
            _graph(), arc_blacklist=[("a", "b")], arc_whitelist=[("a", "b")]
        )


def test_edge_blacklist_and_whitelist_conflict_raises():
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        validate_restrictions(
            _graph(),
            edge_blacklist=[("a", "b")],
            edge_whitelist=[("b", "a")],
        )


def test_arc_whitelist_with_edge_blacklist_raises():
    with pytest.raises(ValueError, match="incompatible"):
        validate_restrictions(
            _graph(), arc_whitelist=[("a", "b")], edge_blacklist=[("a", "b")]
        )


def test_edge_whitelist_plus_arc_whitelist_keeps_arc():
    r = validate_restrictions(
        _graph(), arc_whitelist=[("a", "b")], edge_whitelist=[("a", "b")]
    )
    assert ("a", "b") in r.arc_whitelist
    assert frozenset(("a", "b")) not in r.edge_whitelist


def test_edge_whitelist_plus_arc_blacklist_flips_to_opposite_whitelist():
    r = validate_restrictions(
        _graph(), arc_blacklist=[("a", "b")], edge_whitelist=[("a", "b")]
    )
    assert ("b", "a") in r.arc_whitelist
    assert frozenset(("a", "b")) not in r.edge_whitelist
    # the blacklisted direction is still blacklisted
    assert ("a", "b") in r.arc_blacklist


def test_edge_blacklist_absorbs_arc_blacklist():
    r = validate_restrictions(
        _graph(), arc_blacklist=[("a", "b")], edge_blacklist=[("a", "b")]
    )
    assert r.arc_blacklist == set()
    assert frozenset(("a", "b")) in r.edge_blacklist


def test_unknown_node_in_restriction_raises():
    with pytest.raises(ValueError, match="not present"):
        validate_restrictions(_graph(), arc_blacklist=[("a", "zzz")])
    with pytest.raises(ValueError, match="not present"):
        validate_arc_restrictions(_graph(), arc_whitelist=[("zzz", "a")])


def test_arc_only_variant_conflict_raises():
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        validate_arc_restrictions(
            _graph(), arc_blacklist=[("a", "b")], arc_whitelist=[("a", "b")]
        )


# ------------------------------------------------------------ type lists
def test_type_whitelist_duplicate_conflict_raises():
    from pybnesian_tpu.factors.ckde import CKDEType
    from pybnesian_tpu.factors.lineargaussian import LinearGaussianCPDType

    g = GaussianNetwork(["a", "b"])
    validate_type_restrictions(
        g, type_whitelist=[("a", LinearGaussianCPDType())]
    )
    with pytest.raises(ValueError, match="two FactorType"):
        validate_type_restrictions(
            g,
            type_blacklist=[("b", CKDEType())],
            type_whitelist=[
                ("a", LinearGaussianCPDType()),
                ("a", CKDEType()),
            ],
        )


def test_type_black_and_whitelist_same_type_raises():
    from pybnesian_tpu.factors import LinearGaussianCPDType

    g = GaussianNetwork(["a", "b"])
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        validate_type_restrictions(
            g,
            type_blacklist=[("a", LinearGaussianCPDType())],
            type_whitelist=[("a", LinearGaussianCPDType())],
        )


def test_type_list_unknown_node_raises():
    from pybnesian_tpu.factors import LinearGaussianCPDType

    g = GaussianNetwork(["a", "b"])
    with pytest.raises(ValueError, match="not present"):
        validate_type_restrictions(
            g, type_whitelist=[("zzz", LinearGaussianCPDType())]
        )


# -------------------------------------------------------------- PC wiring
def test_pc_double_blacklist_removes_edge():
    # a-b strongly dependent in the chain; blacklisting both directions must
    # REMOVE the edge, not orient it (the round-2 bug: the second direct()
    # re-oriented to the blacklisted direction)
    df = normal_chain_data(3000)
    pdag = PC().estimate(
        LinearCorrelation(df),
        arc_blacklist=[("a", "b"), ("b", "a")],
        alpha=0.05,
    )
    assert not pdag.has_connection("a", "b")


def test_pc_conflicting_restrictions_raise():
    df = normal_chain_data(500)
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        PC().estimate(
            LinearCorrelation(df),
            arc_blacklist=[("a", "b")],
            arc_whitelist=[("a", "b")],
        )


def test_pc_single_blacklist_directs_other_way():
    df = normal_chain_data(3000)
    pdag = PC().estimate(
        LinearCorrelation(df), arc_blacklist=[("a", "b")], alpha=0.05
    )
    # the surviving dependence must appear only as b -> a
    assert not pdag.has_arc("a", "b")
    assert pdag.has_arc("b", "a")


def test_pc_cyclic_whitelist_raises():
    df = normal_chain_data(500)
    with pytest.raises(ValueError, match="acyclic"):
        PC().estimate(
            LinearCorrelation(df),
            arc_whitelist=[("a", "b"), ("b", "c"), ("c", "a")],
        )


# ------------------------------------------------------------ MMPC wiring
def test_mmpc_double_blacklist_removes_edge():
    df = normal_chain_data(3000)
    pdag = MMPC().estimate(
        LinearCorrelation(df),
        arc_blacklist=[("a", "b"), ("b", "a")],
        alpha=0.05,
    )
    assert not pdag.has_connection("a", "b")


def test_mmpc_conflicting_restrictions_raise():
    df = normal_chain_data(500)
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        MMPC().estimate(
            LinearCorrelation(df),
            arc_blacklist=[("a", "b")],
            arc_whitelist=[("a", "b")],
        )


# --------------------------------------------------------------- hc wiring
def test_hc_conflicting_restrictions_raise():
    df = normal_chain_data(500)
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        hc(
            df,
            arc_blacklist=[("a", "b")],
            arc_whitelist=[("a", "b")],
        )


def test_arc_operator_set_conflict_raises():
    df = normal_chain_data(500)
    model = GaussianNetwork(["a", "b", "c", "d"])
    ops = ArcOperatorSet(
        blacklist=[("a", "b")], whitelist=[("a", "b")]
    )
    with pytest.raises(ValueError, match="blacklist and whitelist"):
        ops.cache_scores(model, BIC(df))
