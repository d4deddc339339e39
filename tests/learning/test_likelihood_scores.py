import numpy as np
import pytest

from pybnesian_tpu.data import CrossValidation
from pybnesian_tpu.factors import LinearGaussianCPD
from pybnesian_tpu.factors.ckde import CKDE, CKDEType
from pybnesian_tpu.factors.lineargaussian import LinearGaussianCPDType
from pybnesian_tpu.learning.scores.likelihood import (
    CVLikelihood,
    HoldoutLikelihood,
    ValidatedLikelihood,
)
from pybnesian_tpu.models import GaussianNetwork, KDENetwork, SemiparametricBN
from data_gen import normal_chain_data


def _cv_oracle_lg(df, k, seed, var, parents):
    """Reference-style serial loop: fit on train folds, slogl on test."""
    cv = CrossValidation(df, k, seed)
    total = 0.0
    for train, test in cv:
        cpd = LinearGaussianCPD(var, parents)
        cpd.fit(train)
        total += cpd.slogl(test)
    return total


def _cv_oracle_ckde(df, k, seed, var, parents):
    cv = CrossValidation(df, k, seed)
    total = 0.0
    for train, test in cv:
        f = CKDE(var, parents)
        f.fit(train)
        total += f.slogl(test)
    return total


def test_cv_lg_matches_serial_oracle():
    df = normal_chain_data(500)
    score = CVLikelihood(df, 5, seed=0)
    model = GaussianNetwork(["a", "b", "c", "d"])
    for var, parents in [("a", []), ("b", ["a"]), ("c", ["a", "b"])]:
        got = score.local_score_node_type(
            model, LinearGaussianCPDType(), var, parents
        )
        ref = _cv_oracle_lg(df, 5, 0, var, parents)
        np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_cv_ckde_matches_serial_oracle():
    df = normal_chain_data(400)
    score = CVLikelihood(df, 5, seed=1)
    model = KDENetwork(["a", "b", "c", "d"])
    for var, parents in [("a", []), ("b", ["a"])]:
        got = score.local_score_node_type(model, CKDEType(), var, parents)
        ref = _cv_oracle_ckde(df, 5, 1, var, parents)
        np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_cv_batch_matches_single():
    df = normal_chain_data(300)
    score = CVLikelihood(df, 5, seed=0)
    model = GaussianNetwork(["a", "b", "c", "d"])
    fams = [("a", [], None), ("b", ["a"], None), ("d", ["a", "b", "c"], None)]
    batch = score.local_score_batch(model, fams)
    for i, (v, ps, _) in enumerate(fams):
        np.testing.assert_allclose(
            batch[i], score.local_score(model, v, ps), rtol=1e-9
        )


def test_holdout_matches_manual():
    df = normal_chain_data(500)
    score = HoldoutLikelihood(df, test_ratio=0.2, seed=3)
    model = GaussianNetwork(["a", "b", "c", "d"])
    got = score.local_score_node_type(model, LinearGaussianCPDType(), "b", ["a"])
    cpd = LinearGaussianCPD("b", ["a"])
    cpd.fit(score.training_data())
    np.testing.assert_allclose(got, cpd.slogl(score.test_data()), rtol=1e-9)
    # batched path agrees
    batch = score.local_score_batch(model, [("b", ["a"], None)])
    np.testing.assert_allclose(batch[0], got, rtol=1e-8)


def test_validated_likelihood_channels():
    df = normal_chain_data(600)
    score = ValidatedLikelihood(df, test_ratio=0.2, k=5, seed=0)
    model = GaussianNetwork(["a", "b", "c", "d"])
    # main channel = CV over holdout-train
    main = score.local_score(model, "b", ["a"])
    ref = _cv_oracle_lg(score.training_data(), 5, 0, "b", ["a"])
    np.testing.assert_allclose(main, ref, rtol=1e-8)
    # validation channel = holdout
    v = score.vlocal_score(model, "b", ["a"])
    cpd = LinearGaussianCPD("b", ["a"])
    cpd.fit(score.holdout_lik.training_data())
    np.testing.assert_allclose(
        v, cpd.slogl(score.holdout_lik.test_data()), rtol=1e-9
    )


def test_hc_kde_network():
    """End-to-end: hc with ValidatedLikelihood on a KDENetwork."""
    from pybnesian_tpu.learning.algorithms import hc
    from pybnesian_tpu.models import KDENetworkType

    df = normal_chain_data(300)
    learned = hc(df, bn_type=KDENetworkType(), patience=0, max_iters=3)
    assert learned.type() == KDENetworkType()
    assert learned.num_arcs() >= 1


def test_hc_spbn_changes_node_types():
    """SPBN search uses arcs + node_type operators."""
    from pybnesian_tpu.learning.algorithms import hc
    from pybnesian_tpu.models import SemiparametricBNType

    rng = np.random.default_rng(0)
    # y strongly non-Gaussian given x -> CKDE should win for y
    x = rng.normal(0, 1, 600)
    y = np.sin(2.5 * x) + rng.normal(0, 0.15, 600)
    import pandas as pd

    df = pd.DataFrame({"x": x, "y": y})
    learned = hc(df, bn_type=SemiparametricBNType(), seed=0, patience=1)
    assert learned.num_nodes() == 2
    types = learned.node_types()
    assert types["y"] == CKDEType()
