import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.learning.algorithms import GreedyHillClimbing, hc
from pybnesian_tpu.learning.operators import ArcOperatorSet
from pybnesian_tpu.learning.scores import BIC
from pybnesian_tpu.models import GaussianNetwork, GaussianNetworkType, DiscreteBN
from data_gen import discrete_data, normal_chain_data


def readme_df():
    np.random.seed(1)
    size = 100
    a = np.random.normal(3, np.sqrt(0.5), size)
    c = -4.2 - 1.2 * a + np.random.normal(0, np.sqrt(0.75), size)
    d = 3 + 1.2 * c + np.random.normal(0, np.sqrt(0.5), size)
    e = np.random.normal(0, 1, size)
    return pd.DataFrame({"a": a, "c": c, "d": d, "e": e})


def test_readme_hc_anchor():
    """hc(df, GaussianNetworkType()) learns 2 arcs (reference README.md:258)."""
    learned = hc(readme_df(), bn_type=GaussianNetworkType())
    assert learned.num_arcs() == 2


def test_hc_one_iter_adds_best_arc():
    """max_iters=1 adds exactly the single best-delta arc (reference
    hillclimbing_test.py behavior)."""
    df = normal_chain_data(1000)
    score = BIC(df)
    start = GaussianNetwork(["a", "b", "c", "d"])
    # find best addition by hand
    best, best_delta = None, -np.inf
    for t in "abcd":
        base = score.local_score(start, t, [])
        for s in "abcd":
            if s == t:
                continue
            d = score.local_score(start, t, [s]) - base
            if d > best_delta:
                best, best_delta = (s, t), d
    learned = hc(df, bn_type=GaussianNetworkType(), max_iters=1)
    assert learned.num_arcs() == 1
    arc = learned.arcs()[0]
    # BIC is score-equivalent: the learned arc is the best pair in either direction
    assert frozenset(arc) == frozenset(best)


def test_hc_blacklist_reverses_arc():
    """Blacklisting the best arc yields its reversal (BIC score equivalence)."""
    df = normal_chain_data(1000)
    learned = hc(df, bn_type=GaussianNetworkType(), max_iters=1)
    (s, t) = learned.arcs()[0]
    learned2 = hc(
        df,
        bn_type=GaussianNetworkType(),
        max_iters=1,
        arc_blacklist=[(s, t)],
    )
    assert learned2.arcs() == [(t, s)]


def test_hc_epsilon_blocks_search():
    df = normal_chain_data(500)
    learned = hc(df, bn_type=GaussianNetworkType(), epsilon=1e9)
    assert learned.num_arcs() == 0


def test_hc_whitelist_forced():
    df = normal_chain_data(500)
    learned = hc(
        df, bn_type=GaussianNetworkType(), arc_whitelist=[("d", "a")]
    )
    assert learned.has_arc("d", "a")


def test_hc_max_indegree():
    df = normal_chain_data(2000)
    learned = hc(df, bn_type=GaussianNetworkType(), max_indegree=1)
    for n in learned.nodes():
        assert learned.num_parents(n) <= 1


def test_hc_improves_score():
    df = normal_chain_data(2000)
    score = BIC(df)
    empty = GaussianNetwork(["a", "b", "c", "d"])
    learned = hc(df, bn_type=GaussianNetworkType())
    assert score.score(learned) > score.score(empty)
    # learned structure should be score-locally-optimal: no single arc
    # addition improves
    for s in "abcd":
        for t in "abcd":
            if s != t and not learned.has_arc(s, t) and learned.can_add_arc(s, t):
                d = score.local_score(
                    learned, t, learned.parents(t) + [s]
                ) - score.local_score(learned, t)
                assert d <= 1e-9


def test_hc_recovers_chain_skeleton():
    df = normal_chain_data(5000)
    learned = hc(df, bn_type=GaussianNetworkType())
    skeleton = {frozenset(a) for a in learned.arcs()}
    # true structure: a->b, (a,b)->c, c->d
    assert frozenset(("a", "b")) in skeleton
    assert frozenset(("c", "d")) in skeleton
    assert frozenset(("b", "c")) in skeleton


def test_hc_discrete_bic():
    df = discrete_data(5000)
    learned = hc(df, bn_type=None, start=DiscreteBN(["A", "B", "C", "D"]), score="bic")
    skeleton = {frozenset(a) for a in learned.arcs()}
    assert frozenset(("A", "B")) in skeleton
    assert frozenset(("C", "D")) in skeleton


def test_estimate_with_explicit_components():
    df = normal_chain_data(500)
    score = BIC(df)
    ops = ArcOperatorSet()
    start = GaussianNetwork(["a", "b", "c", "d"])
    learned = GreedyHillClimbing().estimate(ops, score, start)
    assert learned.num_arcs() >= 3
    # start model untouched
    assert start.num_arcs() == 0


def test_callback_invoked():
    from pybnesian_tpu.learning.algorithms import Callback

    calls = []

    class Recorder(Callback):
        def call(self, model, operator, score, iteration):
            calls.append((iteration, None if operator is None else operator.ToString()))

    df = normal_chain_data(500)
    hc(df, bn_type=GaussianNetworkType(), callback=Recorder())
    assert calls[0][0] == 0 and calls[0][1] is None
    assert calls[-1][1] is None
    assert len(calls) >= 3
