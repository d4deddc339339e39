"""dtype × null grids, mirroring the reference factor-test style
(CKDE_test.py:16-19 runs {f64, f32} × {clean, with-NaN})."""

import numpy as np
import pyarrow as pa
import pytest
from scipy.stats import norm

from pybnesian_tpu import CKDE, KDE, LinearGaussianCPD
from data_gen import normal_chain_data, with_nulls


@pytest.mark.parametrize("dtype", ["float64", "float32"])
@pytest.mark.parametrize("nulls", [False, True])
def test_lineargaussian_grid(dtype, nulls):
    df = normal_chain_data(800, dtype=dtype)
    if nulls:
        df = with_nulls(df, frac=0.1)
    cpd = LinearGaussianCPD("b", ["a"])
    cpd.fit(df)
    sub = df[["a", "b"]].dropna()
    X = np.column_stack([np.ones(len(sub)), sub["a"].astype(np.float64)])
    beta_ref, *_ = np.linalg.lstsq(X, sub["b"].astype(np.float64), rcond=None)
    rtol = 1e-8 if dtype == "float64" else 1e-4
    np.testing.assert_allclose(cpd.beta, beta_ref, rtol=rtol)
    ll = cpd.logl(df)
    mask = (df["a"].isna() | df["b"].isna()).to_numpy()
    assert np.isnan(ll[mask]).all()
    assert np.isfinite(ll[~mask]).all()


@pytest.mark.parametrize("dtype", ["float64", "float32"])
@pytest.mark.parametrize("nulls", [False, True])
def test_ckde_grid(dtype, nulls):
    df = normal_chain_data(400, dtype=dtype)
    test = normal_chain_data(60, seed=7, dtype=dtype)
    if nulls:
        df = with_nulls(df, frac=0.1)
        test = with_nulls(test, frac=0.15)
    ckde = CKDE("b", ["a"])
    ckde.fit(df)
    assert ckde.data_type() == pa.from_numpy_dtype(np.dtype(dtype))
    ll = ckde.logl(test)
    mask = (test["a"].isna() | test["b"].isna()).to_numpy()
    assert np.isnan(ll[mask]).all()
    assert np.isfinite(ll[~mask]).all()
    assert np.isclose(ckde.slogl(test), np.nansum(ll), rtol=1e-6)
    # compare against a from-scratch f64 oracle on the valid rows
    from scipy.special import logsumexp
    from scipy.stats import gaussian_kde

    train = df[["b", "a"]].dropna().to_numpy().astype(np.float64)
    joint = gaussian_kde(train.T, bw_method="silverman")
    h2 = joint.covariance[1, 1]
    tv = test[["b", "a"]].dropna().to_numpy().astype(np.float64)
    d2 = (tv[:, 1][:, None] - train[:, 1][None, :]) ** 2 / h2
    marg = (
        logsumexp(-0.5 * d2, axis=1)
        - 0.5 * np.log(2 * np.pi * h2)
        - np.log(len(train))
    )
    ref = joint.logpdf(tv.T) - marg
    rtol = 1e-6 if dtype == "float64" else 5e-3
    np.testing.assert_allclose(ll[~mask], ref, rtol=rtol, atol=1e-3)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_kde_slogl_grid(dtype):
    df = normal_chain_data(300, dtype=dtype)
    kde = KDE(["a", "b"])
    kde.fit(df)
    test = normal_chain_data(50, seed=3, dtype=dtype)
    s = kde.slogl(test)
    assert np.isfinite(s)
