"""Deterministic synthetic data generators for tests.

Same role as the reference's tests/helpers/util_test.py: fixed seeds, a
4-variable linear-Gaussian chain, independent Gaussians, and discrete
generators. Written fresh for this framework.
"""

import numpy as np
import pandas as pd

SEED = 0


def normal_chain_data(size=10000, seed=SEED, dtype="float64"):
    """a -> b -> c -> d linear-Gaussian chain."""
    rng = np.random.default_rng(seed)
    a = rng.normal(3.0, 0.7, size)
    b = 2.1 - 1.3 * a + rng.normal(0.0, 0.9, size)
    c = -0.4 + 0.5 * a + 1.1 * b + rng.normal(0.0, 0.6, size)
    d = 1.5 - 0.7 * c + rng.normal(0.0, 0.8, size)
    return pd.DataFrame(
        {k: v.astype(dtype) for k, v in dict(a=a, b=b, c=c, d=d).items()}
    )


def normal_indep_data(size=10000, seed=SEED, dtype="float64"):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            n: rng.normal(mu, sd, size).astype(dtype)
            for n, mu, sd in [("a", 0, 1), ("b", 2, 1.5), ("c", -1, 0.5), ("d", 4, 3)]
        }
    )


def with_nulls(df, frac=0.1, seed=SEED):
    """Inject NaNs independently per column (continuous only)."""
    rng = np.random.default_rng(seed + 1)
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            mask = rng.random(len(out)) < frac
            col = out[c].to_numpy().copy()
            col[mask] = np.nan
            out[c] = col
    return out


def discrete_data(size=10000, seed=SEED):
    """4 dependent categorical variables: A -> B, (A,B) -> C, C -> D."""
    rng = np.random.default_rng(seed)
    a = rng.choice(["a1", "a2"], size, p=[0.3, 0.7])
    pb = np.where(a == "a1", 0.2, 0.8)
    b = np.where(rng.random(size) < pb, "b1", "b2")
    pc = 0.1 + 0.4 * (a == "a1") + 0.3 * (b == "b1")
    c = np.where(rng.random(size) < pc, "c1", "c2")
    pd_ = np.where(c == "c1", 0.6, 0.25)
    d = np.where(rng.random(size) < pd_, "d1", "d2")
    return pd.DataFrame(
        {
            "A": pd.Categorical(a),
            "B": pd.Categorical(b),
            "C": pd.Categorical(c),
            "D": pd.Categorical(d),
        }
    )


def mixed_data(size=10000, seed=SEED, dtype="float64"):
    """Two categoricals + two continuous with CLG structure."""
    rng = np.random.default_rng(seed)
    a = rng.choice(["a1", "a2", "a3"], size, p=[0.2, 0.5, 0.3])
    b = rng.choice(["b1", "b2"], size, p=[0.4, 0.6])
    mu = {"a1": -1.0, "a2": 0.5, "a3": 2.0}
    x = np.array([mu[v] for v in a]) + rng.normal(0, 1.0, size)
    y = 0.8 * x + np.where(b == "b1", 1.0, -1.0) + rng.normal(0, 0.5, size)
    return pd.DataFrame(
        {
            "A": pd.Categorical(a),
            "B": pd.Categorical(b),
            "X": x.astype(dtype),
            "Y": y.astype(dtype),
        }
    )
