"""Serialization round-trips for every public class family — mirrors the
reference's largest test area (tests/serialization/, 835 LoC for models)."""

import pickle

import numpy as np
import pytest

from pybnesian_tpu import (
    CKDE,
    BIC,
    CLGNetwork,
    DiscreteBN,
    DiscreteFactor,
    GaussianNetwork,
    HCKDE,
    KDE,
    KDENetwork,
    LinearGaussianCPD,
    NormalReferenceRule,
    ProductKDE,
    ScottsBandwidth,
    SemiparametricBN,
    UCV,
    load,
)
from pybnesian_tpu.factors.ckde import CKDEType
from pybnesian_tpu.factors.hybrid import CLinearGaussianCPD
from pybnesian_tpu.factors.lineargaussian import LinearGaussianCPDType
from data_gen import discrete_data, mixed_data, normal_chain_data


def roundtrip(obj):
    return pickle.loads(pickle.dumps(obj))


def test_factor_types_singleton_identity():
    t1 = roundtrip(LinearGaussianCPDType())
    assert t1 is LinearGaussianCPDType() or t1 == LinearGaussianCPDType()
    t2 = roundtrip(CKDEType())
    assert t2 == CKDEType()


def test_bandwidth_selectors():
    for sel in (NormalReferenceRule(), ScottsBandwidth(), UCV()):
        s2 = roundtrip(sel)
        assert type(s2) is type(sel)


def test_fitted_factors_roundtrip():
    df = normal_chain_data(300)
    mixed = mixed_data(600)
    disc = discrete_data(400)
    factors = []
    lg = LinearGaussianCPD("b", ["a"])
    lg.fit(df)
    factors.append((lg, df))
    ck = CKDE("b", ["a"])
    ck.fit(df)
    factors.append((ck, df))
    d = DiscreteFactor("B", ["A"])
    d.fit(disc)
    factors.append((d, disc))
    clg = CLinearGaussianCPD("Y", ["X", "B"])
    clg.fit(mixed)
    factors.append((clg, mixed))
    h = HCKDE("Y", ["A"])
    h.fit(mixed)
    factors.append((h, mixed))
    for factor, data in factors:
        f2 = roundtrip(factor)
        np.testing.assert_allclose(
            f2.logl(data), factor.logl(data), equal_nan=True, rtol=1e-10
        )


def test_kde_models_roundtrip():
    df = normal_chain_data(200)
    test = normal_chain_data(40, seed=9)
    for model in (KDE(["a", "b"]), ProductKDE(["a"])):
        model.fit(df)
        m2 = roundtrip(model)
        np.testing.assert_allclose(m2.logl(test), model.logl(test))


def test_network_families_roundtrip():
    df = normal_chain_data(400)
    mixed = mixed_data(800)
    disc = discrete_data(500)

    gbn = GaussianNetwork(["a", "b", "c", "d"], [("a", "b"), ("b", "c")])
    gbn.fit(df)
    spbn = SemiparametricBN(["a", "b"], [("a", "b")])
    spbn.fit(df)
    dbn = DiscreteBN(["A", "B", "C"], [("A", "B")])
    dbn.fit(disc)
    clg = CLGNetwork(["A", "X", "Y"], [("A", "X"), ("X", "Y")])
    clg.fit(mixed)

    for model, data in ((gbn, df), (spbn, df), (dbn, disc), (clg, mixed)):
        model.include_cpd = True
        m2 = roundtrip(model)
        assert m2.fitted()
        np.testing.assert_allclose(
            m2.logl(data), model.logl(data), equal_nan=True
        )
        assert m2.type() == model.type()
        assert set(m2.arcs()) == set(model.arcs())


def test_save_load_file(tmp_path):
    df = normal_chain_data(100)
    gbn = GaussianNetwork(["a", "b"], [("a", "b")])
    gbn.fit(df)
    path = str(tmp_path / "net")
    gbn.save(path, include_cpd=True)
    loaded = load(path)
    assert loaded.fitted()


def test_scores_pickle():
    df = normal_chain_data(100)
    s = BIC(df)
    s2 = roundtrip(s)
    m = GaussianNetwork(["a", "b", "c", "d"])
    assert np.isclose(
        s2.local_score(m, "b", ["a"]), s.local_score(m, "b", ["a"])
    )


def test_graphs_and_kdtree_pickle():
    from pybnesian_tpu import Dag, KDTree, UndirectedGraph

    dag = roundtrip(Dag(["a", "b"], [("a", "b")]))
    assert dag.has_arc("a", "b")
    g = roundtrip(UndirectedGraph.Complete(["x", "y", "z"]))
    assert g.num_edges() == 3


def test_python_subclass_factor_pickle():
    """Extension contract: user-defined factor types round-trip
    (reference __getstate_extra__ pattern)."""
    from tests_ext_helpers import OracleFactor, OracleFactorType

    f = OracleFactor("a", [])
    f.fit(normal_chain_data(50))
    f2 = roundtrip(f)
    assert f2.type() == OracleFactorType()
    assert f2.mean == f.mean
