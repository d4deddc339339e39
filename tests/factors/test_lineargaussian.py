import math
import pickle

import numpy as np
import pandas as pd
import pytest
from scipy.stats import norm

from pybnesian_tpu.factors import LinearGaussianCPD, LinearGaussianCPDType
from pybnesian_tpu.learning.parameters import mle_lineargaussian
from data_gen import normal_chain_data, with_nulls


def test_readme_anchor_values():
    """Functional anchor from the reference README (README.md:212-249)."""
    np.random.seed(1)
    size = 100
    a = np.random.normal(3, np.sqrt(0.5), size)
    c = -4.2 - 1.2 * a + np.random.normal(0, np.sqrt(0.75), size)
    d = 3 + 1.2 * c + np.random.normal(0, np.sqrt(0.5), size)
    e = np.random.normal(0, 1, size)
    df = pd.DataFrame({"a": a, "c": c, "d": d, "e": e})

    cpd_a = LinearGaussianCPD("a")
    cpd_a.fit(df)
    assert str(cpd_a) == "[LinearGaussianCPD] P(a) = N(3.043, 0.396)"

    cpd_c = LinearGaussianCPD("c", ["a"])
    cpd_c.fit(df)
    assert str(cpd_c) == "[LinearGaussianCPD] P(c | a) = N(-4.423 + -1.083*a, 0.659)"

    cpd_e = LinearGaussianCPD("e")
    cpd_e.fit(df)
    assert str(cpd_e) == "[LinearGaussianCPD] P(e) = N(-0.020, 1.144)"


def test_mle_matches_lstsq():
    df = normal_chain_data(5000)
    params = mle_lineargaussian(df, "c", ["a", "b"])
    X = np.column_stack(
        [np.ones(len(df)), df["a"].to_numpy(), df["b"].to_numpy()]
    )
    y = df["c"].to_numpy()
    beta_ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose(params.beta, beta_ref, rtol=1e-8)
    resid = y - X @ beta_ref
    np.testing.assert_allclose(
        params.variance, resid @ resid / (len(y) - 3), rtol=1e-8
    )
    # 3+ parent general path agrees with the 2-parent ladder style
    p3 = mle_lineargaussian(df, "d", ["a", "b", "c"])
    X3 = np.column_stack([np.ones(len(df)), df[["a", "b", "c"]].to_numpy()])
    b3, *_ = np.linalg.lstsq(X3, df["d"].to_numpy(), rcond=None)
    np.testing.assert_allclose(p3.beta, b3, rtol=1e-7)


def test_mle_with_nulls_pairwise_deletion():
    df = with_nulls(normal_chain_data(2000), frac=0.15)
    params = mle_lineargaussian(df, "b", ["a"])
    sub = df[["a", "b"]].dropna()
    X = np.column_stack([np.ones(len(sub)), sub["a"].to_numpy()])
    beta_ref, *_ = np.linalg.lstsq(X, sub["b"].to_numpy(), rcond=None)
    np.testing.assert_allclose(params.beta, beta_ref, rtol=1e-8)


def test_constant_parent_guard():
    df = pd.DataFrame({"x": np.ones(50), "y": np.random.default_rng(0).normal(size=50)})
    params = mle_lineargaussian(df, "y", ["x"])
    assert params.beta[1] == 0.0
    assert np.isfinite(params.variance)


def test_underdetermined_variance_inf():
    df = pd.DataFrame({"x": [1.0, 2.0], "y": [0.5, 1.5]})
    params = mle_lineargaussian(df, "y", ["x"])
    assert params.variance == np.inf


def test_logl_matches_scipy():
    df = normal_chain_data(500)
    cpd = LinearGaussianCPD("b", ["a"], [2.1, -1.3], 0.81)
    ll = cpd.logl(df)
    mean = 2.1 - 1.3 * df["a"].to_numpy()
    ref = norm.logpdf(df["b"].to_numpy(), mean, math.sqrt(0.81))
    np.testing.assert_allclose(ll, ref, rtol=1e-10)
    assert np.isclose(cpd.slogl(df), ref.sum())


def test_logl_null_rows_nan():
    df = with_nulls(normal_chain_data(300), frac=0.2)
    cpd = LinearGaussianCPD("b", ["a"], [1.0, 0.5], 1.0)
    ll = cpd.logl(df)
    nulls = (df["a"].isna() | df["b"].isna()).to_numpy()
    assert np.isnan(ll[nulls]).all()
    assert not np.isnan(ll[~nulls]).any()
    assert np.isclose(cpd.slogl(df), np.nansum(ll))


def test_cdf():
    df = normal_chain_data(100)
    cpd = LinearGaussianCPD("a", [], [3.0], 0.49)
    ref = norm.cdf(df["a"].to_numpy(), 3.0, 0.7)
    np.testing.assert_allclose(cpd.cdf(df), ref, rtol=1e-10)


def test_sample_moments():
    cpd = LinearGaussianCPD("y", ["x"], [1.0, 2.0], 0.25)
    ev = pd.DataFrame({"x": np.full(200000, 3.0)})
    s = np.asarray(cpd.sample(200000, ev, seed=0))
    assert abs(s.mean() - 7.0) < 0.01
    assert abs(s.std() - 0.5) < 0.01


def test_validation_errors():
    with pytest.raises(ValueError):
        LinearGaussianCPD("y", ["x"], [1.0], 1.0)  # beta too short
    with pytest.raises(ValueError):
        LinearGaussianCPD("y", [], [1.0], -1.0)  # negative variance
    cpd = LinearGaussianCPD("y", [])
    with pytest.raises(ValueError):
        cpd.logl(pd.DataFrame({"y": [1.0]}))  # not fitted


def test_pickle_roundtrip():
    cpd = LinearGaussianCPD("y", ["x"], [1.0, 2.0], 0.25)
    cpd2 = pickle.loads(pickle.dumps(cpd))
    assert str(cpd2) == str(cpd)
    assert cpd2.type() == LinearGaussianCPDType()
    df = pd.DataFrame({"x": [0.1, 0.2], "y": [1.0, 2.0]})
    np.testing.assert_allclose(cpd2.logl(df), cpd.logl(df))


def test_type_identity():
    assert LinearGaussianCPDType() == LinearGaussianCPDType()
    assert hash(LinearGaussianCPDType()) == hash(LinearGaussianCPDType())
    assert str(LinearGaussianCPDType()) == "LinearGaussianFactor"
