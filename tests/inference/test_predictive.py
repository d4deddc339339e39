"""Posterior-predictive utilities: apply_params round-trips the logdensity
parameterization into fitted CPDs, and posterior_predictive reproduces the
data distribution for LG / CLG / discrete models.
"""

import numpy as np
import pandas as pd
import pytest

import pybnesian_tpu as pbn
from pybnesian_tpu.inference import (
    apply_params,
    make_logdensity,
    nuts,
    posterior_predictive,
)


def lg_data(n=1500, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.normal(1.0, 0.8, n)
    b = -0.5 + 1.2 * a + rng.normal(0, 0.5, n)
    return pd.DataFrame({"a": a, "b": b})


def test_apply_params_lg_consistency():
    df = lg_data()
    model = pbn.GaussianNetwork([("a", "b")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)
    fitted = apply_params(model, df, layout, init)
    # init is the MLE, so the materialized model must match a direct fit
    direct = pbn.GaussianNetwork([("a", "b")])
    direct.fit(df)
    for n in ["a", "b"]:
        np.testing.assert_allclose(
            fitted.cpd(n).beta, direct.cpd(n).beta, rtol=1e-6
        )
        assert fitted.cpd(n).variance == pytest.approx(
            direct.cpd(n).variance, rel=1e-6
        )
    assert fitted.slogl(df) == pytest.approx(direct.slogl(df), rel=1e-8)
    # the original model object is untouched
    with pytest.raises(ValueError, match="not added"):
        model.cpd("a")


def test_posterior_predictive_lg_moments():
    import jax

    df = lg_data()
    model = pbn.GaussianNetwork([("a", "b")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)
    samples, _ = nuts(
        logp, init, jax.random.PRNGKey(0), num_samples=80, num_warmup=80,
        max_depth=6,
    )
    rep = posterior_predictive(
        model, df, layout, np.asarray(samples), n_rows=4000, seed=1
    )
    assert list(rep.columns) == ["a", "b"]
    assert len(rep) == 4000
    for c in ["a", "b"]:
        assert rep[c].mean() == pytest.approx(df[c].mean(), abs=0.15)
        assert rep[c].std() == pytest.approx(df[c].std(), rel=0.15)
    # dependence is preserved
    assert np.corrcoef(rep["a"], rep["b"])[0, 1] == pytest.approx(
        np.corrcoef(df["a"], df["b"])[0, 1], abs=0.1
    )


def test_apply_params_discrete_and_clg():
    rng = np.random.default_rng(4)
    n = 2000
    a = pd.Categorical(np.where(rng.random(n) < 0.35, "hi", "lo"))
    x = np.where(np.asarray(a) == "hi", 1.2, -0.7) + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"A": a, "X": x})
    model = pbn.CLGNetwork([("A", "X")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)
    # discrete init is uniform logits; write the empirical log-frequencies
    # of A into its block so the draw reflects the data
    theta = np.asarray(init, np.float64).copy()
    lo, hi, kind = layout.slices["A"]
    assert kind == "discrete"
    cats = list(df["A"].cat.categories)
    freqs = np.array([(df["A"] == c).mean() for c in cats])
    theta[lo:hi] = np.log(freqs)
    fitted = apply_params(model, df, layout, theta)
    assert fitted.cpd("A").fitted()
    assert fitted.cpd("X").fitted()
    assert np.isfinite(fitted.slogl(df))
    rep = posterior_predictive(
        model, df, layout, theta[None, :], n_rows=3000, seed=2
    )
    # marginal of A and the conditional means of X reproduce
    p_hi = (rep["A"] == "hi").mean()
    assert p_hi == pytest.approx((df["A"] == "hi").mean(), abs=0.05)
    assert rep.loc[rep["A"] == "hi", "X"].mean() == pytest.approx(
        1.2, abs=0.15
    )
    assert rep.loc[rep["A"] == "lo", "X"].mean() == pytest.approx(
        -0.7, abs=0.15
    )
