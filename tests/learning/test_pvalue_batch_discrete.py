"""Round-5 `pvalue_batch` extensions: ChiSquare / hybrid MutualInformation
(all-discrete G-test case) / KMutualInformation. Each batched path must
return the serial path's values — the round-robin PC batcher preserves
serial semantics only if the per-test numbers agree (same contract as
tests/learning/test_pvalue_batch.py pins for LinearCorrelation/RCoT)."""

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu import ChiSquare, KMutualInformation, MutualInformation, PC
from pybnesian_tpu.learning.scores import discrete_native


def _disc_df(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 3, n)
    b = np.where(rng.random(n) < 0.4, rng.integers(0, 3, n), a)
    c = rng.integers(0, 4, n)
    d = np.where(rng.random(n) < 0.5, rng.integers(0, 3, n), b)
    df = pd.DataFrame(
        {
            k: pd.Categorical(v.astype(str))
            for k, v in dict(a=a, b=b, c=c, d=d).items()
        }
    )
    df.loc[::31, "b"] = None
    return df


TRIPLES = [
    ("a", "b", ()),
    ("a", "c", ()),
    ("b", "d", ("a",)),
    ("a", "d", ("b", "c")),
    ("c", "d", ("a", "b")),
]


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_chisquare_batch_matches_serial():
    t = ChiSquare(_disc_df())
    batch = t.pvalue_batch(TRIPLES)
    serial = np.array([t.pvalue(x, y, *zs) for x, y, zs in TRIPLES])
    np.testing.assert_allclose(batch, serial, rtol=1e-10, atol=1e-300)


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_hybrid_mi_batch_matches_serial_mixed_cases():
    df = _disc_df()
    rng = np.random.default_rng(3)
    df["x"] = rng.normal(0, 1, len(df)) + 0.4 * df["a"].cat.codes.to_numpy()
    t = MutualInformation(df)
    triples = TRIPLES + [("a", "x", ()), ("x", "b", ("a",))]
    batch = t.pvalue_batch(triples)
    serial = np.array([t.pvalue(x, y, *zs) for x, y, zs in triples])
    np.testing.assert_allclose(batch, serial, rtol=1e-9, atol=1e-300)


def test_kmi_batch_matches_serial_exactly():
    rng = np.random.default_rng(1)
    n = 120
    z = rng.normal(0, 1, n)
    df = pd.DataFrame(
        {
            "x": z + rng.normal(0, 0.3, n),
            "y": z + rng.normal(0, 0.3, n),
            "z": z,
            "w": rng.normal(0, 1, n),
        }
    )
    t = KMutualInformation(df, k=4, seed=0, samples=30)
    triples = [
        ("x", "y", ()),
        ("x", "w", ()),
        ("x", "y", ("z",)),
        ("y", "w", ("z",)),
    ]
    batch = t.pvalue_batch(triples)
    serial = np.array([t.pvalue(x, y, *zs) for x, y, zs in triples])
    # identical per-test rng streams -> the same Monte-Carlo estimates
    np.testing.assert_allclose(batch, serial, atol=1e-12)


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_pc_chisquare_end_to_end_same_graph():
    """PC with the batched ChiSquare equals PC driven serially."""
    df = _disc_df(3000, seed=7)
    t = ChiSquare(df)
    g_batch = PC().estimate(t, alpha=0.05)

    class SerialOnly(ChiSquare):
        pvalue_batch = None  # force the serial fallback in _batch_eval

        def __init__(self, base):
            self.df = base.df
            self._native_cache = base._native_cache

    s = SerialOnly(t)
    s.pvalue_batch = None
    g_serial = PC().estimate(s, alpha=0.05)
    assert sorted(map(tuple, g_batch.arcs())) == sorted(
        map(tuple, g_serial.arcs())
    )
    assert sorted(map(tuple, map(sorted, g_batch.edges()))) == sorted(
        map(tuple, map(sorted, g_serial.edges()))
    )
