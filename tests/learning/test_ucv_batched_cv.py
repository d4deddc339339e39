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
    df = normal_chain_data(400)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    score = pbn.CVLikelihood(df, k=4, seed=0, construction_args=_ucv_args())
    got = score.local_score(model, "b", ["a", "c"])
    ref = 0.0
    for i in range(4):
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
