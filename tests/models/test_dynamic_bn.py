import numpy as np
import pandas as pd
import pickle
import pytest

from pybnesian_tpu import (
    DynamicDataFrame,
    DynamicGaussianNetwork,
    DynamicVariable,
)
from data_gen import normal_chain_data


def ar_data(n=800, seed=0):
    rng = np.random.default_rng(seed)
    a = np.zeros(n)
    b = np.zeros(n)
    for t in range(1, n):
        a[t] = 0.7 * a[t - 1] + rng.normal(0, 0.4)
        b[t] = 0.5 * a[t - 1] + 0.3 * b[t - 1] + rng.normal(0, 0.4)
    return pd.DataFrame({"a": a, "b": b})


def test_dynamic_dataframe_slices():
    df = normal_chain_data(100)
    ddf = DynamicDataFrame(df, 2)
    assert ddf.markovian_order() == 2
    assert ddf.num_rows == 98
    trans = ddf.transition_df()
    assert trans.num_columns == 12  # 4 vars x 3 slices
    assert "a_t_0" in trans and "a_t_2" in trans
    # slice alignment: a_t_1 row i equals original a row (m - 1 + i)
    np.testing.assert_array_equal(
        trans.col("a_t_1").values, df["a"].to_numpy()[1:99]
    )
    np.testing.assert_array_equal(
        trans.col("a_t_0").values, df["a"].to_numpy()[2:]
    )
    static = ddf.static_df()
    assert set(static.column_names()) == {
        "a_t_1", "b_t_1", "c_t_1", "d_t_1", "a_t_2", "b_t_2", "c_t_2", "d_t_2"
    }


def test_dynamic_dataframe_markov1_static_is_renamed_origin():
    df = normal_chain_data(50)
    ddf = DynamicDataFrame(df, 1)
    static = ddf.static_df()
    assert static.num_rows == 50
    np.testing.assert_array_equal(
        static.col("a_t_1").values, df["a"].to_numpy()
    )


def test_dynamic_variable():
    v = DynamicVariable("x", 2)
    assert v.temporal_name() == "x_t_2"
    df = normal_chain_data(30)
    ddf = DynamicDataFrame(df, 1)
    sel = ddf.loc([("a", 0), ("b", 1)])
    assert sel.column_names() == ["a_t_0", "b_t_1"]


def test_dynamic_gaussian_fit_logl_sample():
    df = ar_data(800)
    dbn = DynamicGaussianNetwork(["a", "b"], 1)
    dbn.static_bn().add_arc("a_t_1", "b_t_1")
    dbn.transition_bn().add_arc("a_t_1", "a_t_0")
    dbn.transition_bn().add_arc("a_t_1", "b_t_0")
    dbn.transition_bn().add_arc("b_t_1", "b_t_0")
    dbn.fit(df)
    assert dbn.fitted()
    # fitted transition coefficient close to the generator
    cpd = dbn.transition_bn().cpd("a_t_0")
    assert abs(cpd.beta[1] - 0.7) < 0.1
    ll = dbn.logl(df.head(200))
    assert len(ll) == 200
    assert np.isfinite(ll).all()
    assert np.isclose(dbn.slogl(df.head(200)), np.nansum(ll))
    s = dbn.sample(100, seed=0).to_pandas()
    assert len(s) == 100
    # sampled series has comparable scale
    assert s["a"].std() < 3 * df["a"].std() + 1


def test_dynamic_pickle_roundtrip(tmp_path):
    df = ar_data(400)
    dbn = DynamicGaussianNetwork(["a", "b"], 1)
    dbn.transition_bn().add_arc("a_t_1", "a_t_0")
    dbn.fit(df)
    path = str(tmp_path / "dbn")
    dbn.save(path, include_cpd=True)
    from pybnesian_tpu import load

    loaded = load(path + ".pickle")
    assert loaded.fitted()
    np.testing.assert_allclose(
        loaded.logl(df.head(50)), dbn.logl(df.head(50))
    )
