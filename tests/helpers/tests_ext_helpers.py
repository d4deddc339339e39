"""User-extension helper classes for the extension-contract tests: plain
Python subclasses of the framework ABCs, usable inside the C++-free search
algorithms (the reference achieves this with pybind11 trampolines,
pybindings_factors.cpp:28-145)."""

import numpy as np

from pybnesian_tpu import Factor, FactorType, Score
from pybnesian_tpu.data import DataFrame


class OracleFactorType(FactorType):
    def new_factor(self, model, variable, evidence, *args, **kwargs):
        return OracleFactor(variable, evidence)

    def ToString(self):
        return "OracleFactorType"


class OracleFactor(Factor):
    """Gaussian factor ignoring evidence — minimal user-defined CPD."""

    def __init__(self, variable, evidence=()):
        super().__init__(variable, evidence)
        self._fitted = False
        self.mean = None
        self.var = None

    def type(self):
        return OracleFactorType()

    def fitted(self):
        return self._fitted

    def fit(self, df):
        df = DataFrame.wrap(df)
        col = df.to_numpy([self.variable()], drop_null=True)[:, 0]
        self.mean = float(col.mean())
        self.var = float(col.var(ddof=1))
        self._fitted = True

    def logl(self, df):
        df = DataFrame.wrap(df)
        x = df.to_numpy([self.variable()], drop_null=False)[:, 0]
        return (
            -0.5 * (x - self.mean) ** 2 / self.var
            - 0.5 * np.log(2 * np.pi * self.var)
        )

    def sample(self, n, evidence_values=None, seed=None):
        rng = np.random.default_rng(seed)
        return rng.normal(self.mean, np.sqrt(self.var), n)

    def ToString(self):
        return f"OracleFactor({self.variable()})"

    def __getstate__(self):
        return {
            "variable": self.variable(),
            "evidence": self.evidence(),
            "fitted": self._fitted,
            "mean": self.mean,
            "var": self.var,
        }

    def __setstate__(self, state):
        Factor.__init__(self, state["variable"], state["evidence"])
        self._fitted = state["fitted"]
        self.mean = state["mean"]
        self.var = state["var"]


class NodeCountScore(Score):
    """User-defined score: prefers more parents up to 2 — exercises the
    OperatorSet/GreedyHillClimbing extension contract."""

    def __init__(self, df):
        self.df = DataFrame.wrap(df)

    def data(self):
        return self.df

    def local_score_node_type(self, model, node_type, variable, parents):
        k = len(parents)
        return float(k if k <= 2 else 4 - k)
