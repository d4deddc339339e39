"""Conditional Pearson χ² test on contingency tables
(reference learning/independences/discrete/chi_square.{hpp,cpp})."""

from __future__ import annotations

import numpy as np
from scipy.special import gammaincc

from ...data import DataFrame
from ...factors.discrete import create_cardinality_strides, joint_counts
from .base import DynamicIndependenceTest, IndependenceTest

__all__ = ["ChiSquare", "DynamicChiSquare"]


class ChiSquare(IndependenceTest):
    def __init__(self, df):
        self.df = DataFrame.wrap(df)
        for c in self.df.column_names():
            if not self.df.is_discrete(c):
                raise ValueError(
                    f"Column '{c}' is not categorical; ChiSquare requires "
                    "categorical data."
                )

    def variable_names(self) -> list[str]:
        return self.df.column_names()

    def pvalue(self, x: str, y: str, *z: str) -> float:
        z = list(z[0]) if len(z) == 1 and not isinstance(z[0], str) else list(z)
        card, strides = create_cardinality_strides(self.df, x, [y, *z])
        counts = joint_counts(self.df, x, [y, *z], card, strides)
        c1, c2 = int(card[0]), int(card[1])
        z_configs = int(np.prod(card[2:])) if len(card) > 2 else 1
        tables = counts.reshape(z_configs, c2, c1)  # [z, y, x] (x fastest)
        statistic = 0.0
        for k in range(z_configs):
            tab = tables[k].astype(np.float64)
            total = tab.sum()
            if total == 0:
                continue
            mx = tab.sum(axis=0)  # marginal over x
            my = tab.sum(axis=1)  # marginal over y
            expected = np.outer(my, mx) / total
            nz = expected > 0
            statistic += float(((tab[nz] - expected[nz]) ** 2 / expected[nz]).sum())
        dof = (c1 - 1) * (c2 - 1) * z_configs
        if dof <= 0:
            # cardinality-1 column: boost::math::chi_squared_distribution
            # rejects df == 0 (reference chi_square.cpp:34)
            raise ValueError(
                "Chi-squared distribution requires dof > 0 "
                f"(got {dof}; a tested column has a single category)."
            )
        return float(gammaincc(0.5 * dof, 0.5 * statistic))  # chi2.sf via direct ufunc


class DynamicChiSquare(DynamicIndependenceTest):
    test_cls = ChiSquare
