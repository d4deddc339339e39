import math
import pickle

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest
from scipy.stats import gaussian_kde, norm

from pybnesian_tpu.data import DataFrame
from pybnesian_tpu.factors.ckde import CKDE, CKDEType
from pybnesian_tpu.kde import KDE, NormalReferenceRule, ProductKDE, ScottsBandwidth
from pybnesian_tpu.utils.exceptions import SingularCovarianceData
from data_gen import normal_chain_data, with_nulls


def test_scotts_bandwidth_matches_scipy():
    df = normal_chain_data(500)
    H = ScottsBandwidth().bandwidth(df, ["a", "b"])
    sk = gaussian_kde(df[["a", "b"]].to_numpy().T)  # default = scott
    np.testing.assert_allclose(H, sk.covariance, rtol=1e-10)


def test_normal_reference_matches_silverman():
    df = normal_chain_data(500)
    H = NormalReferenceRule().bandwidth(df, ["a", "b"])
    sk = gaussian_kde(df[["a", "b"]].to_numpy().T, bw_method="silverman")
    np.testing.assert_allclose(H, sk.covariance, rtol=1e-10)


def test_kde_logl_matches_scipy():
    df = normal_chain_data(300)
    test = normal_chain_data(100, seed=7)
    for cols in (["a"], ["a", "b"], ["a", "b", "c"]):
        kde = KDE(cols, ScottsBandwidth())
        kde.fit(df)
        sk = gaussian_kde(df[cols].to_numpy().T)
        ref = sk.logpdf(test[cols].to_numpy().T)
        np.testing.assert_allclose(kde.logl(test), ref, rtol=1e-8)
        assert np.isclose(kde.slogl(test), ref.sum())


def test_kde_float32():
    df = normal_chain_data(300, dtype="float32")
    test = normal_chain_data(50, seed=3, dtype="float32")
    kde = KDE(["a", "b"])
    kde.fit(df)
    assert kde.data_type() == pa.float32()
    sk = gaussian_kde(
        df[["a", "b"]].to_numpy().astype(np.float64).T, bw_method="silverman"
    )
    ref = sk.logpdf(test[["a", "b"]].to_numpy().astype(np.float64).T)
    np.testing.assert_allclose(kde.logl(test), ref, rtol=5e-3)


def test_kde_nulls():
    df = with_nulls(normal_chain_data(400), frac=0.1)
    test = with_nulls(normal_chain_data(80, seed=5), frac=0.2)
    kde = KDE(["a", "b"])
    kde.fit(df)
    ll = kde.logl(test)
    nulls = (test["a"].isna() | test["b"].isna()).to_numpy()
    assert np.isnan(ll[nulls]).all()
    assert not np.isnan(ll[~nulls]).any()
    # matches scipy fitted on non-null rows
    sub = df[["a", "b"]].dropna()
    sk = gaussian_kde(sub.to_numpy().T, bw_method="silverman")
    ref = sk.logpdf(test[["a", "b"]].to_numpy()[~nulls].T)
    np.testing.assert_allclose(ll[~nulls], ref, rtol=1e-8)


def test_kde_singular_data_raises():
    df = pd.DataFrame({"a": [1.0, 2.0]})
    kde = KDE(["a", "b"])
    with pytest.raises(Exception):
        kde.fit(df)
    df2 = pd.DataFrame({"a": [1.0, 2.0], "b": [1.0, 2.0]})
    with pytest.raises(SingularCovarianceData):
        KDE(["a", "b"]).fit(df2)  # 2 rows <= 2 vars


def test_product_kde():
    df = normal_chain_data(300)
    test = normal_chain_data(60, seed=9)
    pkde = ProductKDE(["a", "b"])
    pkde.fit(df)
    # oracle: manual product-kernel logl with the diagonal bandwidth
    diag = pkde.bandwidth
    X = df[["a", "b"]].to_numpy()
    T = test[["a", "b"]].to_numpy()
    d2 = ((T[:, None, :] - X[None, :, :]) ** 2 / diag[None, None, :]).sum(-1)
    lognorm = -0.5 * np.log(diag).sum() - np.log(2 * np.pi) - np.log(len(X))
    from scipy.special import logsumexp

    ref = logsumexp(-0.5 * d2, axis=1) + lognorm
    np.testing.assert_allclose(pkde.logl(test), ref, rtol=1e-8)


def test_ckde_logl_matches_ratio_of_scipy():
    df = normal_chain_data(300)
    test = normal_chain_data(70, seed=11)
    ckde = CKDE("b", ["a"])
    ckde.fit(df)
    joint = gaussian_kde(df[["b", "a"]].to_numpy().T, bw_method="silverman")
    # marginal KDE with the joint's bandwidth block, computed manually
    from scipy.special import logsumexp

    h2 = joint.covariance[1, 1]
    xa = df["a"].to_numpy()
    ta = test["a"].to_numpy()
    d2 = (ta[:, None] - xa[None, :]) ** 2 / h2
    marg_ref = logsumexp(-0.5 * d2, axis=1) - 0.5 * np.log(
        2 * np.pi * h2
    ) - np.log(len(xa))
    ref = joint.logpdf(test[["b", "a"]].to_numpy().T) - marg_ref
    np.testing.assert_allclose(ckde.logl(test), ref, rtol=1e-7)


def test_ckde_no_evidence_is_kde():
    df = normal_chain_data(200)
    test = normal_chain_data(50, seed=2)
    ckde = CKDE("a")
    ckde.fit(df)
    kde = KDE(["a"])
    kde.fit(df)
    np.testing.assert_allclose(ckde.logl(test), kde.logl(test), rtol=1e-10)


def test_ckde_sample_conditional_moments():
    # y | x with strong dependence: samples at evidence x0 should concentrate
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 2000)
    y = 2.0 * x + rng.normal(0, 0.1, 2000)
    df = pd.DataFrame({"y": y, "x": x})
    ckde = CKDE("y", ["x"])
    ckde.fit(df)
    ev = pd.DataFrame({"x": np.full(5000, 1.0)})
    s = np.asarray(ckde.sample(5000, ev, seed=4))
    assert abs(s.mean() - 2.0) < 0.15
    assert s.std() < 0.5


def test_ckde_cdf_monotone_and_range():
    df = normal_chain_data(300)
    ckde = CKDE("b", ["a"])
    ckde.fit(df)
    test = normal_chain_data(50, seed=13)
    cdf = ckde.cdf(test)
    assert np.all((cdf >= 0) & (cdf <= 1))
    # increasing in b at fixed evidence
    grid = pd.DataFrame({"b": np.linspace(-5, 8, 40), "a": np.full(40, 3.0)})
    g = ckde.cdf(grid)
    assert np.all(np.diff(g) >= -1e-12)


def test_kde_pickle_roundtrip():
    df = normal_chain_data(200)
    kde = KDE(["a", "b"])
    kde.fit(df)
    k2 = pickle.loads(pickle.dumps(kde))
    test = normal_chain_data(30, seed=1)
    np.testing.assert_allclose(k2.logl(test), kde.logl(test))
    ckde = CKDE("b", ["a"])
    ckde.fit(df)
    c2 = pickle.loads(pickle.dumps(ckde))
    np.testing.assert_allclose(c2.logl(test), ckde.logl(test))
    assert c2.type() == CKDEType()
