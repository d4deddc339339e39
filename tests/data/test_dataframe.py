import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.data import CrossValidation, DataFrame, HoldOut
from data_gen import discrete_data, normal_chain_data, with_nulls


def test_wrap_pandas_continuous():
    pdf = normal_chain_data(100)
    df = DataFrame.wrap(pdf)
    assert df.num_rows == 100
    assert df.column_names() == ["a", "b", "c", "d"]
    assert df.is_continuous("a", "b", "c", "d")
    assert not df.is_discrete("a")
    np.testing.assert_array_equal(df.col("a").values, pdf["a"].to_numpy())


def test_wrap_discrete():
    pdf = discrete_data(50)
    df = DataFrame.wrap(pdf)
    assert df.is_discrete("A", "B", "C", "D")
    assert df.cardinality("A") == 2
    assert set(df.categories("A")) == {"a1", "a2"}
    codes = df.codes("A")
    assert codes.dtype == np.int32
    assert codes.min() >= 0


def test_string_columns_become_categorical():
    df = DataFrame.wrap(pd.DataFrame({"s": ["x", "y", "x"]}))
    assert df.is_discrete("s")
    assert df.categories("s") == ("x", "y")


def test_null_handling():
    pdf = with_nulls(normal_chain_data(1000), frac=0.1)
    df = DataFrame.wrap(pdf)
    assert df.null_count("a") == int(pdf["a"].isna().sum())
    joint = (~(pdf["a"].isna() | pdf["b"].isna())).sum()
    assert df.valid_rows("a", "b") == int(joint)
    mat = df.to_numpy(["a", "b"], drop_null=True)
    assert mat.shape == (int(joint), 2)
    assert not np.isnan(mat).any()


def test_to_numpy_add_ones():
    df = DataFrame.wrap(normal_chain_data(10))
    mat = df.to_numpy(["a", "b"], add_ones=True)
    assert mat.shape == (10, 3)
    np.testing.assert_array_equal(mat[:, 0], np.ones(10))


def test_same_type_mismatch_raises():
    pdf = pd.DataFrame(
        {"x": np.zeros(5, np.float32), "y": np.zeros(5, np.float64)}
    )
    df = DataFrame.wrap(pdf)
    with pytest.raises(ValueError):
        df.same_type("x", "y")


def test_loc_and_take():
    df = DataFrame.wrap(normal_chain_data(20))
    sub = df.loc(["b", "d"])
    assert sub.column_names() == ["b", "d"]
    taken = df.take([0, 5, 7])
    assert taken.num_rows == 3
    assert taken.col("a").values[1] == df.col("a").values[5]


def test_device_matrix_masks():
    pdf = with_nulls(normal_chain_data(100), frac=0.2)
    df = DataFrame.wrap(pdf)
    values, valid = df.device_matrix(["a", "b"])
    assert values.shape == (100, 2)
    assert not np.isnan(np.asarray(values)).any()
    np.testing.assert_array_equal(
        np.asarray(valid[:, 0]) > 0, ~pdf["a"].isna().to_numpy()
    )


def test_crossvalidation_folds_partition():
    df = normal_chain_data(103)
    cv = CrossValidation(df, k=10, seed=3)
    all_test = []
    for i, (train, test) in enumerate(cv):
        assert train.num_rows + test.num_rows == 103
        all_test.append(cv.fold_indices(i)[1])
    concat = np.sort(np.concatenate(all_test))
    np.testing.assert_array_equal(concat, np.arange(103))
    # remainder spread on first folds: sizes 11 x3, 10 x7
    sizes = sorted(len(t) for t in all_test)
    assert sizes == [10] * 7 + [11] * 3


def test_crossvalidation_excludes_nulls():
    pdf = with_nulls(normal_chain_data(100), frac=0.2)
    cv = CrossValidation(pdf, k=5, seed=0)
    n_valid = DataFrame.wrap(pdf).valid_rows()
    assert sum(len(cv.fold_indices(i)[1]) for i in range(5)) == n_valid


def test_holdout():
    ho = HoldOut(normal_chain_data(100), test_ratio=0.25, seed=1)
    assert ho.test_data().num_rows == 25
    assert ho.training_data().num_rows == 75


def test_repr():
    df = DataFrame.wrap(discrete_data(5))
    assert "categorical" in repr(df)
