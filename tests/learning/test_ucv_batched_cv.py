"""Batched-UCV CV scoring (round 4): CVLikelihood with UCV-selected CKDE
families runs every (family, fold) bandwidth problem through ONE vmapped
device Nelder-Mead (kde/ucv.py ucv_minimize_batch) instead of a serial
optimization per factor fit. These tests pin the batched path against the
serial per-fold CKDE fit (reference cv_likelihood.cpp:11-25 semantics with
kde/UCV.cpp selection).
"""

import numpy as np
import pytest

import pybnesian_tpu as pbn
from data_gen import normal_chain_data


def _ucv_args():
    return pbn.Arguments({
        "b": pbn.Kwargs(bandwidth_selector=pbn.UCV()),
    })


def test_cv_ucv_matches_serial_factor_fits():
    df = normal_chain_data(300)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    score = pbn.CVLikelihood(df, k=3, seed=0, construction_args=_ucv_args())
    got = score.local_score(model, "b", ["a", "c"])
    ref = 0.0
    for i in range(3):
        tr, te = score.cv.fold_indices(i)
        f = pbn.CKDE("b", ["a", "c"], bandwidth_selector=pbn.UCV())
        f.fit(score.df.take(tr))
        ref += f.slogl(score.df.take(te))
    np.testing.assert_allclose(got, ref, rtol=5e-3)
    # and it must differ from the default NR-selected score (UCV picked a
    # different bandwidth)
    nr = pbn.CVLikelihood(df, k=4, seed=0)
    assert got != nr.local_score(model, "b", ["a", "c"])


def test_cv_ucv_univariate_family():
    df = normal_chain_data(300)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    score = pbn.CVLikelihood(df, k=3, seed=1, construction_args=_ucv_args())
    got = score.local_score(model, "b", [])
    ref = 0.0
    for i in range(3):
        tr, te = score.cv.fold_indices(i)
        f = pbn.CKDE("b", [], bandwidth_selector=pbn.UCV())
        f.fit(score.df.take(tr))
        ref += f.slogl(score.df.take(te))
    np.testing.assert_allclose(got, ref, rtol=5e-3)


def test_cv_ucv_batch_of_families_one_call():
    df = normal_chain_data(300)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    args = pbn.Arguments({
        "a": pbn.Kwargs(bandwidth_selector=pbn.UCV()),
        "b": pbn.Kwargs(bandwidth_selector=pbn.UCV()),
        "c": pbn.Kwargs(bandwidth_selector=pbn.UCV()),
    })
    score = pbn.CVLikelihood(df, k=3, seed=0, construction_args=args)
    fams = [("a", [], None), ("b", ["a"], None), ("c", ["a", "b"], None)]
    batch = score.local_score_batch(model, fams)
    singles = np.array([
        score.local_score(model, v, ps) for (v, ps, _) in fams
    ])
    np.testing.assert_allclose(batch, singles, rtol=1e-9)


def test_cv_ucv_with_nulls_and_degenerate_family():
    df = normal_chain_data(240)
    df.loc[np.arange(0, 240, 7), "b"] = np.nan
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    score = pbn.CVLikelihood(df, k=3, seed=0, construction_args=_ucv_args())
    got = score.local_score(model, "b", ["a"])
    assert np.isfinite(got)
    ref = 0.0
    for i in range(3):
        tr, te = score.cv.fold_indices(i)
        f = pbn.CKDE("b", ["a"], bandwidth_selector=pbn.UCV())
        f.fit(score.df.take(tr))
        ref += f.slogl(score.df.take(te))
    np.testing.assert_allclose(got, ref, rtol=5e-3)


def test_hc_kdenetwork_with_ucv_arguments_runs():
    df = normal_chain_data(150)[["a", "b", "c"]]
    args = pbn.Arguments({
        v: pbn.Kwargs(bandwidth_selector=pbn.UCV())
        for v in ["a", "b", "c"]
    })
    score = pbn.CVLikelihood(df, k=2, seed=0, construction_args=args)
    start = pbn.KDENetwork(["a", "b", "c"])
    model = pbn.GreedyHillClimbing().estimate(
        pbn.ArcOperatorSet(), score, start, max_iters=1,
    )
    assert model.num_nodes() == 3


def test_ucv_d3_result_scores_no_worse_than_start():
    """Regression for the vech/tril index-order scramble: for d>=3 the
    optimizer's coordinates and the returned factor must use the SAME
    (column-major vech) layout, so the returned bandwidth's UCV score can
    never be worse than the normal-reference start it was seeded with."""
    from pybnesian_tpu.kde.bandwidth import NormalReferenceRule
    from pybnesian_tpu.kde.ucv import UCVScorer

    rng = np.random.default_rng(0)
    n = 500
    x = rng.normal(0, 1, n)
    y = 0.8 * x + rng.normal(0, 0.6, n)
    z = -0.5 * x + 0.4 * y + rng.normal(0, 0.7, n)
    import pandas as pd

    df = pd.DataFrame({"x": x, "y": y, "z": z})
    cols = ["x", "y", "z"]
    start = NormalReferenceRule().bandwidth(df, cols)
    got = pbn.UCV().bandwidth(df, cols)
    sc = UCVScorer(df, cols)
    s_start = sc.score_unconstrained(start)
    s_got = sc.score_unconstrained(got)
    assert s_got <= s_start + 1e-6 * abs(s_start), (s_got, s_start)


def test_vech_roundtrip_through_optimizer_indices():
    from pybnesian_tpu.kde.ucv import (
        _vech_indices, invvech_triangular, vech)

    L = np.tril(np.arange(1.0, 17.0).reshape(4, 4))
    v = vech(L)
    rows, cols = _vech_indices(4)
    L2 = np.zeros((4, 4))
    L2[rows, cols] = v
    np.testing.assert_array_equal(L, L2)
    np.testing.assert_array_equal(invvech_triangular(v), L)


def test_holdout_ucv_matches_serial_factor_fit():
    df = normal_chain_data(260)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    score = pbn.HoldoutLikelihood(
        df, test_ratio=0.3, seed=0, construction_args=_ucv_args()
    )
    got = score.local_score(model, "b", ["a"])
    f = pbn.CKDE("b", ["a"], bandwidth_selector=pbn.UCV())
    f.fit(score.training_data())
    ref = f.slogl(score.test_data())
    np.testing.assert_allclose(got, ref, rtol=5e-3)
