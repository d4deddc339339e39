import numpy as np
import pytest

from pybnesian_tpu import (
    ArcOperatorSet,
    BIC,
    ConditionalGaussianNetwork,
    GreedyHillClimbing,
)
from data_gen import normal_chain_data


def test_conditional_hc_learns_interface_arcs():
    """Hill climbing on a conditional BN: interface nodes can only be
    sources (reference operators.cpp conditional delta matrix)."""
    df = normal_chain_data(3000)
    start = ConditionalGaussianNetwork(["c", "d"], ["a", "b"])
    score = BIC(df)
    learned = GreedyHillClimbing().estimate(ArcOperatorSet(), score, start)
    # no arcs into the interface
    for (s, t) in learned.arcs():
        assert t in ("c", "d")
    # c depends on a and b strongly; d on c
    assert ("b", "c") in learned.arcs() or ("a", "c") in learned.arcs()
    assert learned.has_arc("c", "d")
    # fit and evaluate end-to-end
    learned.fit(df)
    ll = learned.logl(df)
    assert np.isfinite(ll).all()


def test_conditional_hc_max_indegree():
    df = normal_chain_data(1500)
    start = ConditionalGaussianNetwork(["c", "d"], ["a", "b"])
    learned = GreedyHillClimbing().estimate(
        ArcOperatorSet(max_indegree=1), BIC(df), start, max_indegree=1
    )
    for n in learned.nodes():
        assert learned.num_parents(n) <= 1


def test_conditional_hc_larger_gaussian():
    rng = np.random.default_rng(0)
    n = 2000
    cols = {}
    base = rng.normal(0, 1, (n, 3))
    for i in range(3):
        cols[f"i{i}"] = base[:, i]
    for j in range(6):
        w = rng.normal(0, 1, 3)
        cols[f"n{j}"] = base @ w + rng.normal(0, 0.5, n)
    import pandas as pd

    df = pd.DataFrame(cols)
    start = ConditionalGaussianNetwork(
        [f"n{j}" for j in range(6)], [f"i{i}" for i in range(3)]
    )
    learned = GreedyHillClimbing().estimate(
        ArcOperatorSet(), BIC(df), start, max_iters=40
    )
    assert learned.num_arcs() > 0
    for (s, t) in learned.arcs():
        assert not t.startswith("i")
