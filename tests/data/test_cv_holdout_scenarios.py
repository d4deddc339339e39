"""CrossValidation / HoldOut behavioral scenarios mirroring the reference's
dataset tests (tests/dataset/crossvalidation_test.py style, re-expressed):
iterator/fold/indices agreement, seed determinism, loc projection."""

import numpy as np

from pybnesian_tpu import CrossValidation, HoldOut

from data_gen import normal_chain_data


def test_cv_iter_matches_indices():
    df = normal_chain_data(500, seed=2)
    cv = CrossValidation(df)
    pairs = list(cv)
    idx_pairs = list(cv.indices())
    assert len(pairs) == 10 and len(idx_pairs) == 10
    for (train_df, test_df), (tr, te) in zip(pairs, idx_pairs):
        assert np.intersect1d(tr, te).size == 0
        assert np.array_equal(
            np.sort(np.concatenate([tr, te])), np.arange(len(df))
        )
        np.testing.assert_array_equal(
            train_df.to_pandas().to_numpy(), df.iloc[tr].to_numpy()
        )
        np.testing.assert_array_equal(
            test_df.to_pandas().to_numpy(), df.iloc[te].to_numpy()
        )


def test_cv_fold_equals_iter():
    df = normal_chain_data(200, seed=3)
    cv = CrossValidation(df, 5, seed=1)
    for i, (train_df, test_df) in enumerate(cv):
        tf, sf = cv.fold(i)
        np.testing.assert_array_equal(
            tf.to_pandas().to_numpy(), train_df.to_pandas().to_numpy()
        )
        np.testing.assert_array_equal(
            sf.to_pandas().to_numpy(), test_df.to_pandas().to_numpy()
        )


def test_cv_seed_determinism():
    df = normal_chain_data(200, seed=4)
    a = [t.to_pandas().to_numpy() for t, _ in CrossValidation(df, seed=0)]
    b = [t.to_pandas().to_numpy() for t, _ in CrossValidation(df, seed=0)]
    c = [t.to_pandas().to_numpy() for t, _ in CrossValidation(df, seed=1)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, z) for x, z in zip(a, c))


def test_cv_loc_projection():
    df = normal_chain_data(150, seed=5)
    cv = CrossValidation(df)
    for train_df, test_df in cv.loc("a"):
        assert train_df.column_names() == ["a"]
        assert test_df.column_names() == ["a"]
    for train_df, _ in cv.loc(["a", "c"]):
        assert train_df.column_names() == ["a", "c"]


def test_holdout_partition_and_seed():
    df = normal_chain_data(200, seed=6)
    ho = HoldOut(df, test_ratio=0.25, seed=3)
    assert ho.training_data().num_rows == 150
    assert ho.test_data().num_rows == 50
    ho2 = HoldOut(df, test_ratio=0.25, seed=3)
    np.testing.assert_array_equal(
        ho.test_data().to_pandas().to_numpy(),
        ho2.test_data().to_pandas().to_numpy(),
    )
