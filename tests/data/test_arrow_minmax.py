"""DataFrame.min/max (reference dataset.hpp:111-165) and Arrow PyCapsule
zero-copy ingest/export (reference util/arrow_types.cpp)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pybnesian_tpu.data import DataFrame


def _df():
    return DataFrame.wrap(
        pd.DataFrame(
            {
                "a": [3.0, np.nan, -1.5, 7.0],
                "b": np.array([1.0, 2.0, 3.0, 4.0], np.float32),
                "c": pd.Categorical(["x", "y", "x", "y"]),
            }
        )
    )


# ------------------------------------------------------------------ min/max
def test_min_max_skip_nulls():
    df = _df()
    assert df.min("a") == -1.5
    assert df.max("a") == 7.0
    assert df.min("b") == np.float32(1.0)
    assert df.max("b") == np.float32(4.0)
    # dtype preserved
    assert isinstance(df.min("b"), np.float32)


def test_min_max_all_null_returns_inf():
    df = DataFrame.wrap(pd.DataFrame({"a": [np.nan, np.nan]}))
    assert df.min("a") == np.inf
    assert df.max("a") == -np.inf


def test_min_max_discrete_raises():
    df = _df()
    with pytest.raises(ValueError):
        df.min("c")
    with pytest.raises(ValueError):
        df.max("c")


# ------------------------------------------------------------------- ingest
def test_from_arrow_recordbatch_zero_copy():
    vals = np.array([1.0, 2.0, 3.0], np.float64)
    rb = pa.RecordBatch.from_arrays([pa.array(vals)], names=["x"])
    df = DataFrame.wrap(rb)
    assert df.column_names() == ["x"]
    col = df.col("x").values
    np.testing.assert_array_equal(col, vals)
    # zero copy: the numpy view shares the Arrow buffer
    assert not col.flags.owndata


def test_from_arrow_table_with_nulls_and_dictionary():
    tbl = pa.table(
        {
            "x": pa.array([1.0, None, 3.0]),
            "k": pa.array(["u", "v", "u"]).dictionary_encode(),
            "s": pa.array(["p", None, "q"]),
        }
    )
    df = DataFrame.wrap(tbl)
    assert np.isnan(df.col("x").values[1])
    assert df.col("k").is_discrete
    assert df.col("k").categories == ("u", "v")
    np.testing.assert_array_equal(df.codes("k"), [0, 1, 0])
    assert df.col("s").is_discrete
    assert df.codes("s")[1] == -1  # null code


def test_from_arrow_integer_and_bool():
    tbl = pa.table(
        {
            "i": pa.array([1, 2, 3], pa.int32()),
            "ni": pa.array([1, None, 3], pa.int64()),
            "b": pa.array([True, False, True]),
        }
    )
    df = DataFrame.wrap(tbl)
    assert df.col("i").values.dtype == np.int64
    assert np.isnan(df.col("ni").values[1])
    assert df.col("b").is_discrete


def test_pycapsule_roundtrip():
    df = _df()
    # export through the PyCapsule stream interface, reimport
    tbl = pa.table(df)
    df2 = DataFrame.wrap(tbl)
    assert df.equals(df2)


def test_wrap_object_with_capsule_interface_only():
    class StreamOnly:
        def __init__(self, tbl):
            self._tbl = tbl

        def __arrow_c_stream__(self, requested_schema=None):
            return self._tbl.__arrow_c_stream__(requested_schema)

    tbl = pa.table({"x": pa.array([1.0, 2.0])})
    df = DataFrame.wrap(StreamOnly(tbl))
    np.testing.assert_array_equal(df.col("x").values, [1.0, 2.0])


def test_model_fit_from_arrow_table():
    import pybnesian_tpu as pbn

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 200)
    b = 0.5 * a + rng.normal(0, 0.3, 200)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    g = pbn.GaussianNetwork(["a", "b"], [("a", "b")])
    g.fit(tbl)
    assert np.isfinite(g.slogl(tbl))
