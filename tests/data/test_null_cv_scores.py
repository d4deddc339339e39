"""Null-data semantics of CrossValidation/HoldOut and the likelihood scores
(reference crossvalidation_test.py test_cv_null, holdout_test.py
test_holdout_null, cvlikelihood_test.py test_cvl_local_score_gbn_null)."""

import math

import numpy as np
import pytest

import pybnesian_tpu as pbn
from data_gen import normal_chain_data, with_nulls


def _null_df(n=500):
    return with_nulls(normal_chain_data(n), frac=0.08)


def test_cv_drops_null_rows_by_default():
    df = _null_df()
    complete = df.dropna()
    cv = pbn.CrossValidation(df, 5, seed=0)
    for (train_df, test_df), (tr, te) in zip(cv, cv.indices()):
        assert train_df.num_rows + test_df.num_rows == len(complete)
        # fold indices point into the ORIGINAL frame and avoid null rows
        assert not np.isnan(df.to_numpy()[np.asarray(tr)]).any()
        assert not np.isnan(df.to_numpy()[np.asarray(te)]).any()
        assert np.intersect1d(np.asarray(tr), np.asarray(te)).size == 0


def test_cv_include_null_keeps_all_rows():
    df = _null_df()
    cv = pbn.CrossValidation(df, 5, seed=0, include_null=True)
    total = sum(
        train.num_rows + test.num_rows for train, test in cv
    ) / 5
    assert total == len(df)


def test_holdout_null_partition():
    df = _null_df()
    complete = df.dropna()
    h = pbn.HoldOut(df, test_ratio=0.25, seed=0)
    assert (
        h.training_data().num_rows + h.test_data().num_rows == len(complete)
    )
    h2 = pbn.HoldOut(df, test_ratio=0.25, seed=0, include_null=True)
    assert (
        h2.training_data().num_rows + h2.test_data().num_rows == len(df)
    )


def test_cvlikelihood_gbn_null_matches_serial_oracle():
    df = _null_df()
    score = pbn.CVLikelihood(df, k=5, seed=0)
    model = pbn.GaussianNetwork(["a", "b", "c", "d"])
    got = score.local_score(model, "b", ["a"])
    # serial oracle: per fold, MLE fit on train rows + logl sum on test rows
    ref = 0.0
    for i in range(5):
        tr, te = score.cv.fold_indices(i)
        f = pbn.LinearGaussianCPD("b", ["a"])
        f.fit(score.df.take(tr))
        ref += float(np.nansum(f.logl(score.df.take(te))))
    np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_cvlikelihood_ckde_null_matches_serial_oracle():
    df = _null_df(400)
    score = pbn.CVLikelihood(df, k=4, seed=0)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    got = score.local_score(model, "c", ["b"])
    ref = 0.0
    for i in range(4):
        tr, te = score.cv.fold_indices(i)
        f = pbn.CKDE("c", ["b"])
        f.fit(score.df.take(tr))
        ref += f.slogl(score.df.take(te))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_holdoutlikelihood_null_matches_manual():
    df = _null_df()
    score = pbn.HoldoutLikelihood(df, test_ratio=0.3, seed=1)
    model = pbn.GaussianNetwork(["a", "b", "c", "d"])
    got = score.local_score(model, "c", ["b"])
    f = pbn.LinearGaussianCPD("c", ["b"])
    f.fit(score.training_data())
    ref = float(np.nansum(f.logl(score.test_data())))
    np.testing.assert_allclose(got, ref, rtol=1e-7)
