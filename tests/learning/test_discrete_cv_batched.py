"""Batched discrete CV-likelihood (round 4): per-fold CPT fit + slogl as
bincounts/dot products over the cached flat configuration index, pinned
bit-identical against the serial per-fold DiscreteFactor fits (reference
cv_likelihood.cpp:11-25)."""

import time

import numpy as np
import pandas as pd

import pybnesian_tpu as pbn
from pybnesian_tpu.factors.discrete import DiscreteFactor
from data_gen import discrete_data


def _serial_cv(score, variable, parents):
    total = 0.0
    for (tr, te) in score._engine.folds:
        f = DiscreteFactor(variable, list(parents))
        f.fit(score.df.take(tr))
        total += f.slogl(score.df.take(te))
    return total


def test_discrete_cv_matches_serial_factor_fits():
    df = discrete_data(2000)
    score = pbn.CVLikelihood(df, k=5, seed=0)
    model = pbn.DiscreteBN(list(df.columns))
    for (v, ps) in [("A", []), ("B", ["A"]), ("D", ["A", "C"]),
                    ("C", ["A", "B", "D"])]:
        got = score.local_score(model, v, ps)
        want = _serial_cv(score, v, ps)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                                   err_msg=f"family {(v, ps)}")


def test_discrete_cv_with_nulls_matches_serial():
    df = discrete_data(1500)
    df.loc[np.arange(0, 1500, 11), "A"] = None
    df["A"] = pd.Categorical(df["A"])
    score = pbn.CVLikelihood(df, k=4, seed=1)
    model = pbn.DiscreteBN(list(df.columns))
    for (v, ps) in [("A", []), ("B", ["A"]), ("A", ["B", "C"])]:
        got = score.local_score(model, v, ps)
        want = _serial_cv(score, v, ps)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_discrete_cv_unseen_config_gives_minus_inf():
    # one category appears in exactly one row → some fold's training part
    # misses it while its test part sees it → that fold's slogl is -inf
    n = 60
    rng = np.random.default_rng(0)
    a = np.array(["x"] * (n - 1) + ["rare"])
    b = rng.choice(["u", "v"], n)
    df = pd.DataFrame({
        "A": pd.Categorical(a), "B": pd.Categorical(b)
    })
    score = pbn.CVLikelihood(df, k=3, seed=0)
    model = pbn.DiscreteBN(["A", "B"])
    got = score.local_score(model, "A", [])
    want = _serial_cv(score, "A", [])
    assert got == want  # both -inf or both the same finite value


def test_discrete_cv_throughput_near_bic():
    """Config-2 shapes: CVLikelihood(k=10) must stay within ~(k/2)x of
    BIC's per-family scoring cost (the old path was >50x: 2 DataFrame
    copies + factor objects per fold)."""
    rng = np.random.default_rng(2)
    n = 10_000
    df = pd.DataFrame({
        c: pd.Categorical(rng.integers(0, 3, n).astype(str))
        for c in "ABCDEFGH"
    })
    model = pbn.DiscreteBN(list("ABCDEFGH"))
    fams = [(c, ["A"] if c != "A" else []) for c in "BCDEFGH"]
    cv = pbn.CVLikelihood(df, k=10, seed=0)
    bic = pbn.BIC(df)
    for (v, ps) in fams:  # warm caches
        cv.local_score(model, v, ps)
        bic.local_score(model, v, ps)
    t0 = time.perf_counter()
    for _ in range(3):
        for (v, ps) in fams:
            cv.local_score(model, v, ps)
    t_cv = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        for (v, ps) in fams:
            bic.local_score(model, v, ps)
    t_bic = time.perf_counter() - t0
    # 10 folds = 10x the counting work of BIC's single pass; allow 2x slack
    assert t_cv < 20 * t_bic + 0.5, (t_cv, t_bic)
