"""Surface-parity checks for methods added to match the reference bindings
(pybindings_*: Assignment mutators, CrossValidation.indices, MLE classes,
validation_data, include_cpd, default_node_types, KDE.num_variables,
IndependenceTest.name, OperatorSet.local_score_cache/find_max_tabu,
UCVScorer)."""

import numpy as np
import pytest

import pybnesian_tpu as p
from data_gen import normal_chain_data


@pytest.fixture(scope="module")
def df():
    return normal_chain_data(100, seed=7)


def test_assignment_mutators():
    a = p.Assignment({"x": 1.0})
    assert not a.empty()
    a.insert("y", "cat")
    assert a.has_variables(["x", "y"])
    assert a.value("y") == "cat"
    assert dict(iter(a))["x"] == 1.0
    a.remove("y")
    assert a.size() == 1
    a.remove("x")
    assert a.empty()


def test_crossvalidation_indices(df):
    cv = p.CrossValidation(df, 5, seed=0)
    pairs = list(cv.indices())
    assert len(pairs) == 5
    n = df.shape[0]
    for train, test in pairs:
        assert len(train) + len(test) == n
        assert len(np.intersect1d(train, test)) == 0
    # all test folds partition the rows
    all_test = np.sort(np.concatenate([t for _, t in pairs]))
    assert np.array_equal(all_test, np.arange(n))


def test_mle_concrete_classes(df):
    est = p.MLE(p.LinearGaussianCPDType())
    assert isinstance(est, p.MLELinearGaussianCPD)
    params = est.estimate(df, "a", [])
    assert np.isclose(params.beta[0], df["a"].mean(), atol=1e-8)
    direct = p.MLELinearGaussianCPD().estimate(df, "c", ["a", "b"])
    assert direct.variance > 0


def test_validated_likelihood_validation_data(df):
    vl = p.ValidatedLikelihood(df, test_ratio=0.2, k=5, seed=0)
    vd = vl.validation_data()
    assert vd.num_rows == vl.holdout.test_data().num_rows


def test_include_cpd_property(df):
    g = p.GaussianNetwork(list(df.columns), [("a", "b")])
    assert g.include_cpd is False
    g.include_cpd = True
    assert g.include_cpd is True
    dbn = p.DynamicGaussianNetwork(list(df.columns), 2)
    assert dbn.include_cpd is False
    dbn.include_cpd = True
    assert dbn.static_bn().include_cpd and dbn.transition_bn().include_cpd


def test_heterogeneous_default_node_types():
    lg = p.LinearGaussianCPDType()
    ht = p.HeterogeneousBNType({"double": [lg]})
    assert ht.default_node_types() == {"double": [lg]}
    ht_list = p.HeterogeneousBNType([lg])
    assert ht_list.default_node_types() == {}
    assert ht_list.single_default()


def test_kde_num_variables_and_save(tmp_path, df):
    k = p.KDE(["a", "b"])
    assert k.num_variables() == 2
    k.fit(df)
    fn = str(tmp_path / "kde.pickle")
    k.save(fn)
    loaded = p.load(fn)
    x = df[["a", "b"]].to_numpy()[:5]
    np.testing.assert_allclose(loaded.logl(df.head(5)), k.logl(df.head(5)))
    pk = p.ProductKDE(["a"])
    assert pk.num_variables() == 1


def test_independence_test_name(df):
    lc = p.LinearCorrelation(df)
    assert lc.name(0) == df.columns[0]
    assert lc.num_variables() == len(df.columns)


def test_operator_set_cache_and_tabu(df):
    ops = p.ArcOperatorSet()
    score = p.BIC(df)
    model = p.GaussianNetwork(list(df.columns))
    ops.cache_scores(model, score)
    cache = ops.local_score_cache()
    assert cache is not None
    assert np.isfinite(cache.sum())
    tabu = p.OperatorTabuSet()
    op_plain = ops.find_max(model)
    op_tabu = ops.find_max_tabu(model, tabu)
    assert op_plain.source() == op_tabu.source()
    assert op_plain.target() == op_tabu.target()
    # find_max_tabu skips tabu ops
    tabu.insert(op_plain)
    op_next = ops.find_max_tabu(model, tabu)
    assert op_next is None or (
        (op_next.source(), op_next.target())
        != (op_plain.source(), op_plain.target())
    )


def test_ucv_scorer_exported(df):
    sc = p.UCVScorer(df, ["a", "b"])
    d = sc.score_diagonal(np.array([0.5, 0.5]))
    h = sc.score_unconstrained(np.diag([0.5, 0.5]))
    assert np.isclose(d, h, rtol=1e-6)
