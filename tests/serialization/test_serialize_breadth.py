"""Reference-breadth serialization coverage: every class family the
reference's serialize_models_test.py (835 LoC) touches — 8 network families ×
{BN, conditional, dynamic} × {include_cpd True/False}, conditional graphs,
operator sets, scores, independence tests and ``__getstate_extra__`` on
models."""

import pickle

import numpy as np
import pytest

import pybnesian_tpu as pbn
from data_gen import discrete_data, mixed_data, normal_chain_data


def roundtrip(obj):
    return pickle.loads(pickle.dumps(obj))


CONT_NODES = ["a", "b", "c", "d"]
CONT_ARCS = [("a", "b"), ("b", "c")]
DISC_NODES = ["A", "B", "C", "D"]
DISC_ARCS = [("A", "B")]
MIXED_NODES = ["A", "B", "X", "Y"]
MIXED_ARCS = [("A", "X"), ("X", "Y")]


def _families():
    lg = pbn.LinearGaussianCPDType()
    ck = pbn.CKDEType()
    return [
        ("gaussian", pbn.GaussianNetwork(CONT_NODES, CONT_ARCS), "cont"),
        ("kde", pbn.KDENetwork(CONT_NODES, CONT_ARCS), "cont"),
        ("spbn", pbn.SemiparametricBN(CONT_NODES, CONT_ARCS), "cont"),
        ("discrete", pbn.DiscreteBN(DISC_NODES, DISC_ARCS), "disc"),
        ("clg", pbn.CLGNetwork(MIXED_NODES, MIXED_ARCS), "mixed"),
        ("homog", pbn.HomogeneousBN(lg, CONT_NODES, CONT_ARCS), "cont"),
        (
            "heterog",
            pbn.HeterogeneousBN([lg, ck], CONT_NODES, CONT_ARCS),
            "cont",
        ),
    ]


def _data(kind, n=400):
    if kind == "cont":
        return normal_chain_data(n)
    if kind == "disc":
        return discrete_data(max(n, 500))
    return mixed_data(max(n, 600))


# ---------------------------------------------------------- unfitted models
@pytest.mark.parametrize("name,model,kind", _families())
def test_unfitted_model_roundtrip(name, model, kind):
    m2 = roundtrip(model)
    assert type(m2) is type(model)
    assert m2.type() == model.type()
    assert set(m2.arcs()) == set(model.arcs())
    assert m2.nodes() == model.nodes()
    assert not m2.fitted()


# -------------------------------------------------- include_cpd semantics
@pytest.mark.parametrize("name,model,kind", _families())
def test_fitted_model_include_cpd_true(name, model, kind):
    data = _data(kind)
    model.fit(data)
    model.include_cpd = True
    m2 = roundtrip(model)
    assert m2.fitted()
    np.testing.assert_allclose(
        m2.logl(data), model.logl(data), equal_nan=True, rtol=1e-9
    )
    # node types survive for heterogeneous families
    for node in model.nodes():
        assert m2.node_type(node) == model.node_type(node)


@pytest.mark.parametrize("name,model,kind", _families())
def test_fitted_model_include_cpd_false_drops_cpds(name, model, kind):
    """CPDs must NOT survive the roundtrip when include_cpd is False
    (reference BayesianNetwork.hpp __getstate__)."""
    data = _data(kind)
    model.fit(data)
    model.include_cpd = False
    m2 = roundtrip(model)
    assert not m2.fitted()
    assert set(m2.arcs()) == set(model.arcs())


def test_save_argument_overrides_include_cpd_property(tmp_path):
    df = normal_chain_data(120)
    g = pbn.GaussianNetwork(["a", "b"], [("a", "b")])
    g.fit(df)
    g.include_cpd = False
    g.save(str(tmp_path / "with_cpd"), include_cpd=True)
    assert pbn.load(str(tmp_path / "with_cpd")).fitted()
    g.include_cpd = True
    g.save(str(tmp_path / "no_cpd"), include_cpd=False)
    assert not pbn.load(str(tmp_path / "no_cpd")).fitted()
    # the property itself must be restored after save
    assert g.include_cpd is True


# ------------------------------------------------------ conditional models
def _conditional_families():
    lg = pbn.LinearGaussianCPDType()
    nodes, iface = ["c", "d"], ["a", "b"]
    dn, di = ["C", "D"], ["A", "B"]
    mn, mi = ["X", "Y"], ["A", "B"]
    return [
        ("cgauss", pbn.ConditionalGaussianNetwork(nodes, iface), "cont"),
        ("ckde", pbn.ConditionalKDENetwork(nodes, iface), "cont"),
        ("cspbn", pbn.ConditionalSemiparametricBN(nodes, iface), "cont"),
        ("cdisc", pbn.ConditionalDiscreteBN(dn, di), "disc"),
        ("cclg", pbn.ConditionalCLGNetwork(mn, mi), "mixed"),
        ("chomog", pbn.ConditionalHomogeneousBN(lg, nodes, iface), "cont"),
        (
            "cheterog",
            pbn.ConditionalHeterogeneousBN([lg], nodes, iface),
            "cont",
        ),
    ]


@pytest.mark.parametrize("name,model,kind", _conditional_families())
def test_conditional_model_roundtrip(name, model, kind):
    for n in model.nodes():
        for i in model.interface_nodes():
            model.add_arc(i, n)
    m2 = roundtrip(model)
    assert type(m2) is type(model)
    assert set(m2.interface_nodes()) == set(model.interface_nodes())
    assert set(m2.arcs()) == set(model.arcs())
    assert m2.type() == model.type()


def test_conditional_fitted_roundtrip():
    df = normal_chain_data(400)
    m = pbn.ConditionalGaussianNetwork(["c", "d"], ["a", "b"])
    m.add_arc("a", "c")
    m.add_arc("c", "d")
    m.fit(df)
    m.include_cpd = True
    m2 = roundtrip(m)
    assert m2.fitted()
    np.testing.assert_allclose(m2.logl(df), m.logl(df), rtol=1e-10)


# --------------------------------------------------------- dynamic models
def _dynamic_families():
    lg = pbn.LinearGaussianCPDType()
    return [
        ("dyngauss", pbn.DynamicGaussianNetwork(CONT_NODES, 2), "cont"),
        ("dynkde", pbn.DynamicKDENetwork(CONT_NODES, 2), "cont"),
        ("dynspbn", pbn.DynamicSemiparametricBN(CONT_NODES, 2), "cont"),
        ("dyndisc", pbn.DynamicDiscreteBN(DISC_NODES, 2), "disc"),
        ("dynclg", pbn.DynamicCLGNetwork(MIXED_NODES, 2), "mixed"),
        (
            "dynhomog",
            pbn.DynamicHomogeneousBN(lg, CONT_NODES, 2),
            "cont",
        ),
        (
            "dynheterog",
            pbn.DynamicHeterogeneousBN([lg], CONT_NODES, 2),
            "cont",
        ),
    ]


@pytest.mark.parametrize("name,model,kind", _dynamic_families())
def test_dynamic_model_unfitted_roundtrip(name, model, kind):
    m2 = roundtrip(model)
    assert type(m2) is type(model)
    assert m2.markovian_order() == model.markovian_order()
    assert set(m2.variables()) == set(model.variables())
    assert not m2.fitted()


@pytest.mark.parametrize(
    "name,model,kind",
    [f for f in _dynamic_families() if f[0] in ("dyngauss", "dyndisc")],
)
def test_dynamic_model_fitted_roundtrip(name, model, kind):
    data = _data(kind, 500)
    model.fit(data)
    model.include_cpd = True
    m2 = roundtrip(model)
    assert m2.fitted()
    np.testing.assert_allclose(
        m2.logl(data), model.logl(data), equal_nan=True, rtol=1e-9
    )


# ------------------------------------------------------ conditional graphs
def test_conditional_graphs_roundtrip():
    g = pbn.ConditionalDag(["c", "d"], ["a", "b"], [("a", "c"), ("c", "d")])
    g2 = roundtrip(g)
    assert set(g2.arcs()) == set(g.arcs())
    assert set(g2.interface_nodes()) == {"a", "b"}

    dg = pbn.ConditionalDirectedGraph(["c"], ["a"])
    dg.add_arc("a", "c")
    dg2 = roundtrip(dg)
    assert dg2.has_arc("a", "c")

    ug = pbn.ConditionalUndirectedGraph(["c", "d"], ["a"])
    ug.add_edge("a", "c")
    ug2 = roundtrip(ug)
    assert ug2.has_edge("a", "c")

    pg = pbn.ConditionalPartiallyDirectedGraph(["c", "d"], ["a"])
    pg.add_edge("c", "d")
    pg.add_arc("a", "c")
    pg2 = roundtrip(pg)
    assert pg2.has_edge("c", "d") and pg2.has_arc("a", "c")


def test_pdag_roundtrip_preserves_mixed_structure():
    g = pbn.PartiallyDirectedGraph(["a", "b", "c"])
    g.add_arc("a", "b")
    g.add_edge("b", "c")
    g2 = roundtrip(g)
    assert g2.has_arc("a", "b") and g2.has_edge("b", "c")


# ------------------------------------------------------------ operator sets
def test_operators_and_sets_roundtrip():
    add = pbn.AddArc("a", "b", 1.5)
    a2 = roundtrip(add)
    assert a2.source() == "a" and a2.target() == "b"
    assert a2.delta() == 1.5
    rem = roundtrip(pbn.RemoveArc("a", "b", -0.5))
    assert rem.delta() == -0.5
    flip = roundtrip(pbn.FlipArc("a", "b", 0.25))
    assert flip.source() == "a"

    arc_set = pbn.ArcOperatorSet(
        blacklist=[("a", "b")], whitelist=[("c", "d")], max_indegree=3
    )
    s2 = roundtrip(arc_set)
    assert s2._blacklist == arc_set._blacklist
    assert s2._whitelist == arc_set._whitelist
    assert s2._max_indegree == 3

    pool = pbn.OperatorPool([pbn.ArcOperatorSet(), pbn.ChangeNodeTypeSet()])
    p2 = roundtrip(pool)
    assert len(p2._op_sets) == 2
    assert {type(s).__name__ for s in p2._op_sets} == {
        "ArcOperatorSet",
        "ChangeNodeTypeSet",
    }

    tabu = pbn.OperatorTabuSet()
    tabu.insert(pbn.AddArc("a", "b", 0.0))
    t2 = roundtrip(tabu)
    assert t2.contains(pbn.AddArc("a", "b", 0.0))


# ----------------------------------------------------------------- scores
def test_all_scores_roundtrip_with_parity():
    df = normal_chain_data(300)
    disc = discrete_data(400)
    m = pbn.GaussianNetwork(CONT_NODES)
    md = pbn.DiscreteBN(DISC_NODES)
    for score, model, var, pa in [
        (pbn.BIC(df), m, "b", ["a"]),
        (pbn.BGe(df), m, "b", ["a"]),
        (pbn.BDe(disc), md, "B", ["A"]),
        (pbn.CVLikelihood(df, k=4, seed=0), m, "b", ["a"]),
        (pbn.HoldoutLikelihood(df, test_ratio=0.3, seed=0), m, "b", ["a"]),
        (pbn.ValidatedLikelihood(df, k=4, seed=0), m, "b", ["a"]),
    ]:
        s2 = roundtrip(score)
        np.testing.assert_allclose(
            s2.local_score(model, var, pa),
            score.local_score(model, var, pa),
            rtol=1e-9,
        )


# ------------------------------------------------------ independence tests
def test_all_independence_tests_roundtrip_with_parity():
    df = normal_chain_data(400)
    disc = discrete_data(500)
    mixed = mixed_data(500)
    tests = [
        (pbn.LinearCorrelation(df), ("a", "b")),
        (pbn.ChiSquare(disc), ("A", "B")),
        (pbn.RCoT(df, seed=0), ("a", "b")),
        (pbn.KMutualInformation(df, k=4, seed=0, samples=10), ("a", "b")),
        (pbn.MutualInformation(mixed), ("X", "Y")),
    ]
    for test, (x, y) in tests:
        t2 = roundtrip(test)
        np.testing.assert_allclose(
            t2.pvalue(x, y), test.pvalue(x, y), rtol=1e-9
        )


# ----------------------------------------------- __getstate_extra__ models
class TaggedGaussianNetwork(pbn.GaussianNetwork):
    """Python subclass adding custom pickled state via the
    __getstate_extra__ / __setstate_extra__ hooks (reference
    pybindings_models.cpp extra-state pattern)."""

    def __init__(self, *args, tag="", **kwargs):
        super().__init__(*args, **kwargs)
        self.tag = tag

    def __getstate_extra__(self):
        return {"tag": self.tag}

    def __setstate_extra__(self, extra):
        self.tag = extra["tag"]


def test_model_getstate_extra_roundtrip():
    df = normal_chain_data(150)
    m = TaggedGaussianNetwork(["a", "b"], [("a", "b")], tag="hello")
    m.fit(df)
    m.include_cpd = True
    m2 = roundtrip(m)
    assert isinstance(m2, TaggedGaussianNetwork)
    assert m2.tag == "hello"
    assert m2.fitted()
    np.testing.assert_allclose(m2.slogl(df), m.slogl(df))
