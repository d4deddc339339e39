"""Behavior-port of the reference's per-class KDE/ProductKDE/CKDE test
scenarios (tests/factors/continuous/{KDE,ProductKDE,CKDE}_test.py) with
fresh data and oracles: dtype-mismatch messages, bandwidth formulas
(Chacon-Duong product normal reference rule), settable bandwidths, custom
selectors, null-row statistics, NaN-propagating logl, and variable-order
invariance.
"""

import numpy as np
import pyarrow as pa
import pytest

from data_gen import normal_chain_data, with_nulls
from pybnesian_tpu.factors.ckde import CKDE
from pybnesian_tpu.kde import (
    KDE,
    BandwidthSelector,
    NormalReferenceRule,
    ProductKDE,
    ScottsBandwidth,
)
from pybnesian_tpu.utils.exceptions import SingularCovarianceData

SIZE = 400
DF = normal_chain_data(SIZE, seed=11)
DF32 = DF.astype("float32")
TEST = normal_chain_data(60, seed=12)
TEST32 = TEST.astype("float32")

VAR_SETS = [["a"], ["b", "a"], ["c", "a", "b"], ["d", "a", "b", "c"]]


def nr_diag_bandwidth(df, variables):
    """Chacon & Duong (2018) eq. 3.4 product-kernel normal reference rule,
    the reference's NormalReferenceRule::diag_bandwidth."""
    cov = df[variables].cov().to_numpy()
    var = np.diag(cov)
    delta = cov / var[:, None]
    delta_inv = np.linalg.inv(delta)
    n = df.shape[0]
    d = len(variables)
    k = (
        4.0
        * d
        * np.sqrt(np.linalg.det(delta))
        / (2.0 * np.trace(delta_inv @ delta_inv) + np.trace(delta_inv) ** 2)
    )
    return (k / n) ** (2.0 / (d + 4.0)) * var


def diag_kde_oracle_logl(train, test, h):
    """Direct numpy Gaussian-mixture logl with a fixed diagonal bandwidth
    vector ``h`` (oracle for ProductKDE evaluation)."""
    from scipy.special import logsumexp

    train = np.atleast_2d(train)
    test = np.atleast_2d(test)
    n, d = train.shape
    z = test[:, None, :] - train[None, :, :]  # (m, n, d)
    d2 = np.sum(z * z / np.asarray(h)[None, None, :], axis=2)
    lognorm = -0.5 * np.sum(np.log(h)) - 0.5 * d * np.log(2 * np.pi) - np.log(n)
    return logsumexp(-0.5 * d2, axis=1) + lognorm


def product_oracle_logl(train, test):
    """Product-kernel normal-reference-rule KDE logl oracle."""
    cov = np.atleast_2d(np.cov(train, rowvar=False, ddof=1))
    var = np.diag(cov)
    delta = cov / var[:, None]
    delta_inv = np.linalg.inv(delta)
    n, d = train.shape
    k = (
        4.0
        * d
        * np.sqrt(np.linalg.det(delta))
        / (2.0 * np.trace(delta_inv @ delta_inv) + np.trace(delta_inv) ** 2)
    )
    h = (k / n) ** (2.0 / (d + 4.0)) * var
    return diag_kde_oracle_logl(train, test, h)


# --------------------------------------------------------------- messages


@pytest.mark.parametrize(
    "make",
    [
        lambda: KDE(["a"]),
        lambda: ProductKDE(["a"]),
        lambda: CKDE("a", ["b"]),
    ],
    ids=["KDE", "ProductKDE", "CKDE"],
)
def test_dtype_mismatch_message(make):
    cpd = make()
    cpd.fit(DF)
    for call in (cpd.logl, cpd.slogl):
        with pytest.raises(ValueError) as ex:
            call(DF32)
        assert "Data type of training and test datasets is different." in str(
            ex.value
        )
    cpd = make()
    cpd.fit(DF32)
    for call in (cpd.logl, cpd.slogl):
        with pytest.raises(ValueError) as ex:
            call(DF)
        assert "Data type of training and test datasets is different." in str(
            ex.value
        )


def test_data_type_unfitted_raises():
    with pytest.raises(ValueError, match="not fitted"):
        KDE(["a"]).data_type()
    with pytest.raises(ValueError, match="not fitted"):
        ProductKDE(["a"]).data_type()
    k = ProductKDE(["a"])
    k.fit(DF)
    assert k.data_type() == pa.float64()
    k.fit(DF32)
    assert k.data_type() == pa.float32()


# -------------------------------------------------------------- bandwidth


@pytest.mark.parametrize("variables", VAR_SETS[2:], ids=["d3", "d4"])
@pytest.mark.parametrize("instances", [60, 150, 400])
def test_productkde_nr_bandwidth(variables, instances):
    cpd = ProductKDE(variables)
    cpd.fit(DF.iloc[:instances])
    np.testing.assert_allclose(
        cpd.bandwidth, nr_diag_bandwidth(DF.iloc[:instances], variables)
    )
    cpd.fit(DF32.iloc[:instances])
    np.testing.assert_allclose(
        cpd.bandwidth,
        nr_diag_bandwidth(DF.iloc[:instances], variables),
        atol=5e-4,
        rtol=1e-3,
    )


@pytest.mark.parametrize("variables", VAR_SETS[1:3], ids=["d2", "d3"])
def test_productkde_scotts_bandwidth(variables):
    cpd = ProductKDE(variables, ScottsBandwidth())
    cpd.fit(DF)
    n = len(DF)
    d = len(variables)
    expected = n ** (-2.0 / (d + 4.0)) * DF[variables].var().to_numpy()
    np.testing.assert_allclose(cpd.bandwidth, expected)


def test_bandwidth_setters():
    cpd = ProductKDE(["a"])
    cpd.fit(DF)
    cpd.bandwidth = [1.0]
    assert cpd.bandwidth == np.asarray([1.0])
    # the underlying evaluation must use the new bandwidth
    np.testing.assert_allclose(
        cpd.logl(TEST),
        diag_kde_oracle_logl(
            DF[["a"]].to_numpy(), TEST[["a"]].to_numpy(), [1.0]
        ),
        rtol=1e-8,
    )
    with pytest.raises(ValueError):
        cpd.bandwidth = [1.0, 2.0]

    full = KDE(["a", "b"])
    full.fit(DF)
    full.bandwidth = np.eye(2)
    np.testing.assert_array_equal(full.bandwidth, np.eye(2))
    with pytest.raises(ValueError):
        full.bandwidth = np.eye(3)


class UnitaryBandwidth(BandwidthSelector):
    def bandwidth(self, df, variables):
        return np.eye(len(list(variables)))

    def diag_bandwidth(self, df, variables):
        return np.ones(len(list(variables)))


@pytest.mark.parametrize("variables", [["a"], ["a", "b", "c", "d"]])
def test_custom_selector(variables):
    kde = KDE(variables, UnitaryBandwidth())
    kde.fit(DF)
    np.testing.assert_array_equal(kde.bandwidth, np.eye(len(variables)))

    pkde = ProductKDE(variables, UnitaryBandwidth())
    pkde.fit(DF)
    np.testing.assert_array_equal(pkde.bandwidth, np.ones(len(variables)))
    pkde.fit(DF32)
    np.testing.assert_array_equal(pkde.bandwidth, np.ones(len(variables)))


# ------------------------------------------------------------- null stats


@pytest.mark.parametrize("variables", VAR_SETS, ids=["d1", "d2", "d3", "d4"])
def test_fit_null_statistics(variables):
    dfn = with_nulls(DF, frac=0.15, seed=3)
    cpd = ProductKDE(variables)
    cpd.fit(dfn)
    sub = dfn[variables].dropna()
    assert cpd.num_instances() == len(sub)
    assert cpd.num_variables() == len(variables)
    np.testing.assert_allclose(
        cpd.bandwidth, nr_diag_bandwidth(sub, variables)
    )


# ------------------------------------------------------------------- logl


@pytest.mark.parametrize("variables", VAR_SETS, ids=["d1", "d2", "d3", "d4"])
def test_productkde_logl_oracle(variables):
    cpd = ProductKDE(variables)
    cpd.fit(DF)
    logl = cpd.logl(TEST)
    oracle = product_oracle_logl(
        DF[variables].to_numpy(), TEST[variables].to_numpy()
    )
    np.testing.assert_allclose(logl, oracle, rtol=1e-7, atol=1e-8)
    assert cpd.slogl(TEST) == pytest.approx(oracle.sum(), rel=1e-7)


def test_productkde_logl_null_propagates_nan():
    tn = with_nulls(TEST, frac=0.2, seed=4)
    cpd = ProductKDE(["a", "b"])
    cpd.fit(DF)
    logl = cpd.logl(tn)
    mask = tn[["a", "b"]].isna().any(axis=1).to_numpy()
    assert np.all(np.isnan(logl[mask]))
    oracle = product_oracle_logl(
        DF[["a", "b"]].to_numpy(), tn[["a", "b"]].dropna().to_numpy()
    )
    np.testing.assert_allclose(logl[~mask], oracle, rtol=1e-7, atol=1e-8)
    # slogl sums only the complete rows
    assert cpd.slogl(tn) == pytest.approx(oracle.sum(), rel=1e-7)


@pytest.mark.parametrize(
    "cls", [KDE, ProductKDE], ids=["KDE", "ProductKDE"]
)
def test_variable_order_invariance(cls):
    c1 = cls(["d", "a", "b", "c"])
    c1.fit(DF)
    c2 = cls(["a", "c", "d", "b"])
    c2.fit(DF)
    np.testing.assert_allclose(c1.logl(TEST), c2.logl(TEST), rtol=1e-9)
    assert c1.slogl(TEST) == pytest.approx(c2.slogl(TEST), rel=1e-9)


# ------------------------------------------------------------------- CKDE


def test_ckde_joint_marg_live_references():
    cpd = CKDE("c", ["a", "b"])
    cpd.fit(DF)
    cpd.kde_joint().bandwidth = np.eye(3)
    np.testing.assert_array_equal(cpd.kde_joint().bandwidth, np.eye(3))
    cpd.kde_marg().bandwidth = np.eye(2)
    np.testing.assert_array_equal(cpd.kde_marg().bandwidth, np.eye(2))


def test_kde_too_few_instances_raises():
    with pytest.raises(SingularCovarianceData):
        KDE(["a", "b", "c"]).fit(DF.iloc[:3])
    with pytest.raises(SingularCovarianceData):
        ProductKDE(["a", "b", "c"]).fit(DF.iloc[:3])
