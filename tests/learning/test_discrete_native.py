"""Native discrete-BIC core (_native/discretecore.cpp): parity with the
numpy counting path across family widths, nulls, and the fallback tier."""

import numpy as np
import pandas as pd
import pytest

import pybnesian_tpu as pbn
from pybnesian_tpu.learning.scores import discrete_native
from data_gen import discrete_data


pytestmark = pytest.mark.skipif(
    not discrete_native.available(), reason="native core unavailable"
)


def _numpy_scores(score, fams):
    import pybnesian_tpu.learning.scores.discrete_native as dn

    saved = (dn._LIB, dn._TRIED)
    dn._LIB, dn._TRIED = None, True
    try:
        return np.array([score._bic_discrete(v, ps) for v, ps in fams])
    finally:
        dn._LIB, dn._TRIED = saved


def test_native_bic_matches_numpy_all_widths():
    df = discrete_data(3000)
    score = pbn.BIC(df)
    fams = [
        ("A", []),
        ("B", ["A"]),
        ("C", ["A", "B"]),
        ("D", ["A", "B", "C"]),
    ]
    native = score._batched_discrete(fams)
    want = _numpy_scores(score, fams)
    np.testing.assert_allclose(native, want, rtol=1e-12)


def test_native_bic_with_nulls_matches_numpy():
    df = discrete_data(2000)
    df.loc[np.arange(0, 2000, 13), "A"] = None
    df["A"] = pd.Categorical(df["A"])
    df.loc[np.arange(5, 2000, 17), "C"] = None
    df["C"] = pd.Categorical(df["C"])
    score = pbn.BIC(df)
    fams = [("A", []), ("B", ["A"]), ("A", ["B", "C"]), ("D", ["C"])]
    native = score._batched_discrete(fams)
    want = _numpy_scores(score, fams)
    np.testing.assert_allclose(native, want, rtol=1e-12)


def test_native_single_family_path():
    df = discrete_data(1000)
    score = pbn.BIC(df)
    model = pbn.DiscreteBN(list(df.columns))
    got = score.local_score(model, "B", ["A", "C"])
    want = float(_numpy_scores(score, [("B", ["A", "C"])])[0])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_hc_discrete_bic_same_structure_with_and_without_native():
    df = discrete_data(4000)
    import pybnesian_tpu.learning.scores.discrete_native as dn

    m1 = pbn.hc(df, bn_type=pbn.DiscreteBNType(), score="bic", max_iters=10)
    saved = (dn._LIB, dn._TRIED)
    dn._LIB, dn._TRIED = None, True
    try:
        m2 = pbn.hc(df, bn_type=pbn.DiscreteBNType(), score="bic",
                    max_iters=10)
    finally:
        dn._LIB, dn._TRIED = saved
    assert set(m1.arcs()) == set(m2.arcs())
