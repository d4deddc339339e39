"""Null-data semantics of every independence test (reference pairwise-deletion
behavior, dataset.hpp:238-335; the reference's KMutualInformation has no null
handling at all — ours drops incomplete rows before ranking)."""

import numpy as np
import pandas as pd
import pytest

from data_gen import discrete_data, mixed_data, normal_chain_data, with_nulls
from pybnesian_tpu.learning.independences import (
    ChiSquare,
    KMutualInformation,
    LinearCorrelation,
    MutualInformation,
    RCoT,
)


def test_linearcorrelation_with_nulls_matches_clean_subset():
    df = with_nulls(normal_chain_data(2000), frac=0.1)
    test = LinearCorrelation(df)
    # oracle: drop rows null in (a, b), recompute on the clean frame
    sub = df[["a", "b"]].dropna()
    clean = LinearCorrelation(sub)
    np.testing.assert_allclose(
        test.pvalue("a", "b"), clean.pvalue("a", "b"), rtol=1e-9
    )
    # conditional case drops rows null in any of (a, d, c)
    sub3 = df[["a", "d", "c"]].dropna().rename(columns={})
    clean3 = LinearCorrelation(sub3)
    np.testing.assert_allclose(
        test.pvalue("a", "d", "c"), clean3.pvalue("a", "d", "c"), rtol=1e-9
    )


def test_linearcorrelation_null_still_detects_dependence():
    df = with_nulls(normal_chain_data(3000), frac=0.15)
    test = LinearCorrelation(df)
    assert test.pvalue("a", "b") < 1e-8
    assert test.pvalue("a", "d", "c") > 0.01


def test_rcot_with_nulls_matches_clean_subset():
    df = with_nulls(normal_chain_data(1500), frac=0.1)
    test = RCoT(df, seed=0)
    sub = df[["a", "b", "c"]].dropna()
    clean = RCoT(sub, seed=0)
    # same seed + same surviving rows => identical Fourier draws and p-value
    np.testing.assert_allclose(
        test.pvalue("a", "c", "b"), clean.pvalue("a", "c", "b"), rtol=1e-8
    )


def test_kmutualinformation_drops_null_rows():
    df = with_nulls(normal_chain_data(400), frac=0.1)
    test = KMutualInformation(df, k=5, seed=0, samples=25)
    clean = KMutualInformation(df.dropna(), k=5, seed=0, samples=25)
    # dropping incomplete rows before ranking => identical estimates
    np.testing.assert_allclose(test.mi("a", "b"), clean.mi("a", "b"),
                               rtol=1e-12)
    np.testing.assert_allclose(
        test.mi("a", "c", "b"), clean.mi("a", "c", "b"), rtol=1e-12
    )
    # and the statistic stays sane: dependence detected on nulled data
    assert test.pvalue("a", "b") < 0.05


def test_kmutualinformation_too_few_complete_rows_raises():
    df = pd.DataFrame(
        {
            "a": [1.0, np.nan, 3.0, np.nan, 5.0, np.nan],
            "b": [np.nan, 2.0, 3.0, 4.0, np.nan, 6.0],
        }
    )
    with pytest.raises(ValueError, match="complete rows"):
        KMutualInformation(df, k=5)


def test_chisquare_with_nulls_matches_clean_subset():
    df = discrete_data(4000)
    rng = np.random.default_rng(3)
    mask = rng.random(len(df)) < 0.1
    dfn = df.copy()
    col = dfn["A"].astype(object)
    col[mask] = None
    dfn["A"] = pd.Categorical(col)
    test = ChiSquare(dfn)
    clean = ChiSquare(dfn.dropna())
    np.testing.assert_allclose(
        test.pvalue("A", "B"), clean.pvalue("A", "B"), rtol=1e-9
    )


def test_hybrid_mutualinformation_with_nulls():
    df = with_nulls(mixed_data(3000), frac=0.1)
    test = MutualInformation(df)
    cont = [c for c in df.columns if df[c].dtype.kind == "f"]
    a, b = cont[0], cont[1]
    sub = df[[a, b]].dropna()
    clean = MutualInformation(sub)
    np.testing.assert_allclose(
        test.mi(a, b), clean.mi(a, b), rtol=1e-9
    )
    p = test.pvalue(a, b)
    assert 0.0 <= p <= 1.0
