import pickle

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.data import DataFrame
from pybnesian_tpu.factors import DiscreteFactor, DiscreteFactorType
from data_gen import discrete_data


def test_fit_marginal_counts():
    df = discrete_data(1000)
    f = DiscreteFactor("A")
    f.fit(df)
    counts = df["A"].value_counts()
    p_ref = {c: counts[c] / 1000 for c in ["a1", "a2"]}
    cats = DataFrame.wrap(df).categories("A")
    lp = f.logprob()
    for i, c in enumerate(cats):
        assert np.isclose(lp[i], np.log(p_ref[c]))


def test_fit_conditional_counts():
    df = discrete_data(5000)
    f = DiscreteFactor("C", ["A", "B"])
    f.fit(df)
    wrapped = DataFrame.wrap(df)
    catsC = wrapped.categories("C")
    catsA = wrapped.categories("A")
    catsB = wrapped.categories("B")
    # check one configuration by pandas crosstab
    sub = df[(df["A"] == catsA[1]) & (df["B"] == catsB[0])]
    p_ref = (sub["C"] == catsC[0]).mean()
    # flat index: c + a*2 + b*4  (strides: C=1, A=2, B=4)
    lp = f.logprob()
    assert np.isclose(np.exp(lp[0 + 1 * 2 + 0 * 4]), p_ref, atol=1e-12)


def test_logl_oracle():
    df = discrete_data(2000)
    f = DiscreteFactor("B", ["A"])
    f.fit(df)
    ll = f.logl(df)
    # oracle via pandas groupby
    tab = pd.crosstab(df["A"], df["B"], normalize="index")
    ref = np.array(
        [np.log(tab.loc[a, b]) for a, b in zip(df["A"], df["B"])]
    )
    np.testing.assert_allclose(ll, ref, rtol=1e-10)
    assert np.isclose(f.slogl(df), ref.sum())


def test_unseen_config_uniform():
    df = pd.DataFrame(
        {
            "X": pd.Categorical(["x1", "x1", "x2"]),
            "P": pd.Categorical(["p1", "p1", "p1"], categories=["p1", "p2"]),
        }
    )
    f = DiscreteFactor("X", ["P"])
    f.fit(df)
    lp = f.logprob().reshape(2, 2)  # (parent_config, var)
    np.testing.assert_allclose(lp[1], np.log(0.5))


def test_domain_mismatch_raises():
    df = discrete_data(100)
    f = DiscreteFactor("A")
    f.fit(df)
    other = pd.DataFrame({"A": pd.Categorical(["a1"], categories=["a1", "a3"])})
    with pytest.raises(ValueError):
        f.logl(other)


def test_continuous_data_raises():
    df = pd.DataFrame({"A": [0.5, 1.5]})
    f = DiscreteFactor("A")
    with pytest.raises(ValueError):
        f.fit(df)


def test_sample_marginal_distribution():
    df = discrete_data(5000)
    f = DiscreteFactor("A")
    f.fit(df)
    codes = f.sample(100000, seed=0).indices.to_numpy()
    freq = np.bincount(codes, minlength=2) / 100000
    expected = np.exp(f.logprob())
    np.testing.assert_allclose(freq, expected, atol=0.01)


def test_sample_conditional():
    df = discrete_data(5000)
    f = DiscreteFactor("B", ["A"])
    f.fit(df)
    wrapped = DataFrame.wrap(df)
    catsA = wrapped.categories("A")
    ev = pd.DataFrame(
        {"A": pd.Categorical([catsA[0]] * 50000, categories=list(catsA))}
    )
    codes = f.sample(50000, ev, seed=1).indices.to_numpy()
    freq = np.bincount(codes, minlength=2) / 50000
    expected = np.exp(f.logprob().reshape(2, 2)[0])
    np.testing.assert_allclose(freq, expected, atol=0.01)


def test_null_codes_nan_logl():
    df = pd.DataFrame({"A": pd.Categorical(["x", None, "y"])})
    f = DiscreteFactor("A")
    f.fit(df)
    ll = f.logl(df)
    assert np.isnan(ll[1])
    assert not np.isnan(ll[0])


def test_pickle():
    df = discrete_data(500)
    f = DiscreteFactor("C", ["A"])
    f.fit(df)
    f2 = pickle.loads(pickle.dumps(f))
    np.testing.assert_allclose(f2.logl(df), f.logl(df))
    assert f2.type() == DiscreteFactorType()
