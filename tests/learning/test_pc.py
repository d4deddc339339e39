import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.graph import PartiallyDirectedGraph
from pybnesian_tpu.learning.algorithms.pc import PC, MeekRules
from pybnesian_tpu.learning.independences import ChiSquare, LinearCorrelation
from data_gen import discrete_data, normal_chain_data, normal_indep_data


def test_linearcorrelation_marginal():
    df = normal_chain_data(2000)
    test = LinearCorrelation(df)
    # a and b strongly dependent
    assert test.pvalue("a", "b") < 1e-10
    # independent variables
    dfi = normal_indep_data(2000)
    ti = LinearCorrelation(dfi)
    assert ti.pvalue("a", "b") > 0.01


def test_linearcorrelation_conditional():
    df = normal_chain_data(5000)
    test = LinearCorrelation(df)
    # chain a -> b -> c -> d: a ⫫ d | c (c blocks)
    assert test.pvalue("a", "d", "c") > 0.01
    # but a and d are marginally dependent
    assert test.pvalue("a", "d") < 1e-6
    # multiple conditioning
    assert test.pvalue("a", "d", "b", "c") > 0.01


def test_linearcorrelation_matches_scipy_pearson():
    from scipy.stats import pearsonr

    df = normal_chain_data(500)
    test = LinearCorrelation(df)
    r, p = pearsonr(df["a"], df["b"])
    np.testing.assert_allclose(test.pvalue("a", "b"), p, rtol=1e-6)


def test_chisquare():
    df = discrete_data(5000)
    test = ChiSquare(df)
    assert test.pvalue("A", "B") < 1e-6  # dependent
    # D depends on C only: A ⫫ D | C approximately
    assert test.pvalue("A", "D", "C") > 0.01


def test_chisquare_matches_scipy():
    from scipy.stats import chi2_contingency

    df = discrete_data(2000)
    test = ChiSquare(df)
    tab = pd.crosstab(df["A"], df["B"])
    stat, p, dof, _ = chi2_contingency(tab, correction=False)
    np.testing.assert_allclose(test.pvalue("A", "B"), p, rtol=1e-8)


def test_meek_rule1():
    g = PartiallyDirectedGraph(["a", "b", "c"])
    g.add_arc("a", "b")
    g.add_edge("b", "c")
    assert MeekRules.rule1(g)
    assert g.has_arc("b", "c")


def test_meek_rule2():
    g = PartiallyDirectedGraph(["a", "b", "c"])
    g.add_arc("a", "c")
    g.add_arc("c", "b")
    g.add_edge("a", "b")
    assert MeekRules.rule2(g)
    assert g.has_arc("a", "b")


def test_meek_rule3():
    g = PartiallyDirectedGraph(["a", "b", "c1", "c2"])
    g.add_edge("b", "a")
    g.add_edge("b", "c1")
    g.add_edge("b", "c2")
    g.add_arc("c1", "a")
    g.add_arc("c2", "a")
    assert MeekRules.rule3(g)
    assert g.has_arc("b", "a")


def test_pc_recovers_chain_skeleton():
    df = normal_chain_data(5000)
    pdag = PC().estimate(LinearCorrelation(df), alpha=0.05)
    skeleton = {frozenset(e) for e in pdag.edges()} | {
        frozenset(a) for a in pdag.arcs()
    }
    assert frozenset(("a", "b")) in skeleton
    assert frozenset(("b", "c")) in skeleton
    assert frozenset(("c", "d")) in skeleton
    assert frozenset(("a", "d")) not in skeleton
    assert frozenset(("b", "d")) not in skeleton


def test_pc_vstructure_detection():
    # collider: x -> z <- y with x ⫫ y
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 8000)
    y = rng.normal(0, 1, 8000)
    z = x + y + rng.normal(0, 0.5, 8000)
    df = pd.DataFrame({"x": x, "y": y, "z": z})
    pdag = PC().estimate(LinearCorrelation(df), alpha=0.05)
    assert pdag.has_arc("x", "z")
    assert pdag.has_arc("y", "z")
    assert not pdag.has_connection("x", "y")


def test_pc_independent_data_empty_graph():
    df = normal_indep_data(3000)
    pdag = PC().estimate(LinearCorrelation(df), alpha=0.01)
    assert pdag.num_edges() + pdag.num_arcs() <= 1  # allow one false positive


def test_pc_discrete():
    df = discrete_data(8000)
    pdag = PC().estimate(ChiSquare(df), alpha=0.05)
    skeleton = {frozenset(e) for e in pdag.edges()} | {
        frozenset(a) for a in pdag.arcs()
    }
    assert frozenset(("A", "B")) in skeleton
    assert frozenset(("C", "D")) in skeleton


def test_pc_whitelist_blacklist():
    df = normal_chain_data(3000)
    pdag = PC().estimate(
        LinearCorrelation(df),
        arc_whitelist=[("a", "b")],
        alpha=0.05,
    )
    assert pdag.has_arc("a", "b")
    pdag2 = PC().estimate(
        LinearCorrelation(df),
        edge_blacklist=[("a", "b")],
        alpha=0.05,
    )
    assert not pdag2.has_connection("a", "b")


def test_pc_to_dag():
    df = normal_chain_data(4000)
    pdag = PC().estimate(LinearCorrelation(df), alpha=0.05)
    dag = pdag.to_dag()
    assert dag.is_dag()


def test_meek_rules_to_fixpoint_koller_3_13():
    """Koller & Friedman Fig. 3.13 (p. 90): iterating the three Meek rules
    on the published PDAG reaches the known fixpoint (same golden example
    the reference validates against, constraint_test.py)."""
    from pybnesian_tpu import PartiallyDirectedGraph

    g = PartiallyDirectedGraph(
        ["A", "B", "C", "D", "E", "F", "G"],
        [("B", "E"), ("C", "E")],
        [("A", "B"), ("B", "D"), ("C", "F"), ("E", "F"), ("F", "G")],
    )
    changed = True
    while changed:
        changed = (
            MeekRules.rule1(g) or MeekRules.rule2(g) or MeekRules.rule3(g)
        )
    assert {tuple(sorted(e)) for e in g.edges()} == {("A", "B"), ("B", "D")}
    assert set(g.arcs()) == {
        ("B", "E"), ("C", "E"), ("E", "F"), ("C", "F"), ("F", "G")
    }


def test_meek_rule3_koller_3_12():
    """Koller Fig. 3.12 rule-3 case: X−Y1, X−Y2, X−Z undirected with
    Y1→Z, Y2→Z directs X→Z only."""
    from pybnesian_tpu import PartiallyDirectedGraph

    g = PartiallyDirectedGraph(
        ["X", "Y1", "Y2", "Z"],
        [("Y1", "Z"), ("Y2", "Z")],
        [("X", "Y1"), ("X", "Y2"), ("X", "Z")],
    )
    assert MeekRules.rule3(g)
    assert {tuple(sorted(e)) for e in g.edges()} == {("X", "Y1"), ("X", "Y2")}
    assert set(g.arcs()) == {("X", "Z"), ("Y1", "Z"), ("Y2", "Z")}
    assert not MeekRules.rule3(g)
