"""Dynamic independence-test adaptors: each Dynamic* wrapper must expose
static/transition element tests over a DynamicDataFrame's slice views
(reference DynamicIndependenceTest, independence.hpp:33-49).
"""

import numpy as np
import pandas as pd
import pytest

import pybnesian_tpu as pbn


def continuous_series(n=600, seed=13):
    rng = np.random.default_rng(seed)
    a = np.zeros(n)
    b = np.zeros(n)
    for t in range(1, n):
        a[t] = 0.7 * a[t - 1] + rng.normal(0, 0.5)
        b[t] = 0.5 * a[t - 1] + rng.normal(0, 0.5)
    return pd.DataFrame({"a": a, "b": b})


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (pbn.DynamicLinearCorrelation, {}),
        (pbn.DynamicRCoT, {}),
        (pbn.DynamicMutualInformation, {}),
        (pbn.DynamicKMutualInformation, {"k": 5, "samples": 30}),
    ],
    ids=["lincorr", "rcot", "hybrid-mi", "cmiknn"],
)
def test_dynamic_continuous_adaptors(cls, kwargs):
    ddf = pbn.DynamicDataFrame(continuous_series(), 1)
    test = cls(ddf, **kwargs)
    st = test.static_tests()
    tr = test.transition_tests()
    p_static = st.pvalue("a_t_1", "b_t_1")
    assert 0.0 <= p_static <= 1.0
    # a_t_1 drives b_t_0: the transition test must see strong dependence
    p_tr = tr.pvalue("b_t_0", "a_t_1")
    assert 0.0 <= p_tr <= 1.0
    if cls is pbn.DynamicLinearCorrelation:
        assert p_tr < 1e-6
    assert test.markovian_order() == 1


def test_dynamic_chi_square():
    rng = np.random.default_rng(3)
    n = 800
    x = np.empty(n, dtype=object)
    x[0] = "u"
    for t in range(1, n):
        x[t] = x[t - 1] if rng.random() < 0.8 else ("u" if x[t - 1] == "v" else "v")
    y = np.where(rng.random(n) < 0.5, "p", "q")
    df = pd.DataFrame(
        {"x": pd.Categorical(x.astype(str)), "y": pd.Categorical(y)}
    )
    ddf = pbn.DynamicDataFrame(df, 1)
    test = pbn.DynamicChiSquare(ddf)
    # persistent chain: x_t_0 strongly depends on x_t_1
    assert test.transition_tests().pvalue("x_t_0", "x_t_1") < 1e-6
    # y is independent noise
    assert test.transition_tests().pvalue("y_t_0", "x_t_1") > 0.01
