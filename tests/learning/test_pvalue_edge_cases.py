"""Edge cases of the direct-ufunc tail probabilities (round-3 review):
tiny-negative MI estimates, negative HBE statistics, zero-dof chi-squared,
and has_unknown_node_types scope on conditional networks.
"""

import numpy as np
import pandas as pd
import pytest

import pybnesian_tpu as pbn
from pybnesian_tpu.utils.chisquaresum import hbe, hbe_complement


def test_hybrid_mi_exactly_independent_table_pvalue_one():
    # counts form an exact product measure -> MI rounds to a tiny negative;
    # the p-value must be 1.0, not NaN
    x = ["u"] * 5 + ["v"] * 5 + ["w"] * 15
    y = (["p"] * 1 + ["q"] * 4) * 5
    # build x,y independent: repeat each x level against the same y marginal
    x = []
    y = []
    for xl, nx in [("u", 1), ("v", 1), ("w", 3)]:
        for yl, ny in [("p", 1), ("q", 4)]:
            x += [xl] * (nx * ny)
            y += [yl] * (nx * ny)
    df = pd.DataFrame({"x": pd.Categorical(x), "y": pd.Categorical(y)})
    mi = pbn.MutualInformation(df)
    p = mi.pvalue("x", "y")
    assert not np.isnan(p)
    assert p == pytest.approx(1.0)


def test_hbe_negative_statistic_clamps():
    coeffs = 0.5 ** np.arange(10)
    # tiny quantile drives the moment-matched statistic negative
    assert hbe(coeffs, 1e-6) == 0.0
    assert hbe_complement(coeffs, 1e-6) == 1.0
    # and the normal range still behaves like a CDF
    assert 0.0 < hbe(coeffs, 2.0) < 1.0
    assert hbe(coeffs, 2.0) + hbe_complement(coeffs, 2.0) == pytest.approx(1.0)


def test_chisquare_single_category_raises():
    df = pd.DataFrame(
        {
            "x": pd.Categorical(["only"] * 50),
            "y": pd.Categorical(np.random.default_rng(0).choice(["a", "b"], 50)),
        }
    )
    cs = pbn.ChiSquare(df)
    with pytest.raises(ValueError, match="dof > 0"):
        cs.pvalue("x", "y")


def test_has_unknown_node_types_ignores_interface_nodes():
    from data_gen import normal_chain_data

    df = normal_chain_data(100, seed=2)[["a", "b"]].copy()
    df["z"] = pd.Categorical(["u", "v"] * 50)
    cbn = pbn.ConditionalSemiparametricBN(["a", "b"], ["z"])
    cbn.set_unknown_node_types(df)
    assert cbn.node_type("z") == pbn.UnknownFactorType()
    assert not cbn.has_unknown_node_types()
