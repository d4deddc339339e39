import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu import (
    KMutualInformation,
    MutualInformation,
    RCoT,
)
from data_gen import discrete_data, mixed_data, normal_chain_data, normal_indep_data


# ------------------------------------------------------------- hybrid MI
def test_hybrid_mi_discrete_matches_sklearn_style():
    df = discrete_data(3000)
    test = MutualInformation(df)
    # dependent pair: small pvalue
    assert test.pvalue("A", "B") < 1e-4
    # D ⫫ A | C
    assert test.pvalue("A", "D", "C") > 0.01


def test_hybrid_mi_continuous_pair():
    df = normal_chain_data(3000)
    test = MutualInformation(df)
    assert test.pvalue("a", "b") < 1e-8
    assert test.pvalue("a", "d", "c") > 0.01
    dfi = normal_indep_data(3000)
    ti = MutualInformation(dfi)
    assert ti.pvalue("a", "b") > 0.01


def test_hybrid_mi_mixed_pair():
    df = mixed_data(3000)
    test = MutualInformation(df)
    # A affects X strongly
    assert test.pvalue("A", "X") < 1e-6
    # B is independent of X
    assert test.pvalue("B", "X") > 0.01
    # B affects Y
    assert test.pvalue("B", "Y") < 1e-6


def test_hybrid_mi_conditional_mixed():
    df = mixed_data(4000)
    test = MutualInformation(df)
    # A ⫫ Y | X approximately (A only acts on Y through X)
    p_cond = test.pvalue("A", "Y", "X")
    p_marg = test.pvalue("A", "Y")
    assert p_marg < 0.01
    assert p_cond > p_marg


def test_hybrid_mi_value_nonnegative():
    df = mixed_data(500)
    test = MutualInformation(df)
    for args in [("A", "X"), ("A", "B"), ("X", "Y"), ("A", "Y", "X")]:
        assert test.mi(*args) >= 0


# ---------------------------------------------------------------- CMIknn
def test_cmiknn_mi_detects_dependence():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 300)
    y = x + rng.normal(0, 0.3, 300)
    w = rng.normal(0, 1, 300)
    df = pd.DataFrame({"x": x, "y": y, "w": w})
    test = KMutualInformation(df, k=5, seed=0, samples=50)
    assert test.mi("x", "y") > test.mi("x", "w")
    assert test.pvalue("x", "y") < 0.05
    assert test.pvalue("x", "w") > 0.05


def test_cmiknn_conditional():
    rng = np.random.default_rng(1)
    z = rng.normal(0, 1, 300)
    x = z + rng.normal(0, 0.3, 300)
    y = z + rng.normal(0, 0.3, 300)
    df = pd.DataFrame({"x": x, "y": y, "z": z})
    test = KMutualInformation(df, k=5, seed=0, samples=100)
    # x, y strongly dependent marginally; much weaker given z
    assert test.pvalue("x", "y") < 0.02
    assert test.pvalue("x", "y", "z") > 0.02


# ------------------------------------------------------------------ RCoT
def test_rcot_marginal():
    df = normal_chain_data(1000)
    test = RCoT(df, seed=0)
    assert test.pvalue("a", "b") < 0.01
    dfi = normal_indep_data(1000)
    ti = RCoT(dfi, seed=0)
    assert ti.pvalue("a", "b") > 0.01


def test_rcot_conditional_blocks():
    df = normal_chain_data(2000)
    test = RCoT(df, seed=1)
    assert test.pvalue("a", "d", "c") > 0.01
    assert test.pvalue("a", "d") < 0.01


def test_rcot_nonlinear_dependence():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 1500)
    y = np.sin(2 * x) + rng.normal(0, 0.2, 1500)
    w = rng.normal(0, 1, 1500)
    df = pd.DataFrame({"x": x, "y": y, "w": w})
    test = RCoT(df, seed=3)
    assert test.pvalue("x", "y") < 0.01
    assert test.pvalue("x", "w") > 0.01


def test_chisquaresum_lpb4_hbe_consistency():
    from scipy.stats import chi2

    from pybnesian_tpu.utils.chisquaresum import hbe_complement, lpb4_complement

    # equal weights => chi2 with k dof; hbe is exact-ish there, while the
    # lpb4 root bracketing degenerates (the reference falls back to hbe too)
    coeffs = np.ones(6)
    for q in [2.0, 6.0, 12.0]:
        exact = chi2.sf(q, 6)
        assert abs(hbe_complement(coeffs, q) - exact) < 0.02
    # unequal weights: compare both approximations to a Monte-Carlo estimate
    rng = np.random.default_rng(0)
    coeffs = np.array([3.0, 1.5, 0.7, 0.2, 0.1])
    draws = (rng.chisquare(1, (200000, 5)) * coeffs[None, :]).sum(axis=1)
    for q in [3.0, 8.0]:
        mc = float((draws > q).mean())
        assert abs(hbe_complement(coeffs, q) - mc) < 0.03
        assert abs(lpb4_complement(coeffs, q) - mc) < 0.01
