"""Metamorphic check: on a 3-node Gaussian problem, greedy hill-climbing
with BIC must reach the global BIC optimum over ALL 25 three-node DAGs
(BIC is score-equivalent, and with strong signal the landscape has no local
optima for greedy arc moves at this size)."""

import itertools

import numpy as np
import pandas as pd

import pybnesian_tpu as pbn


def _all_dags(nodes):
    """Enumerate every DAG on the given nodes (by arc subsets that are
    acyclic)."""
    pairs = [(a, b) for a in nodes for b in nodes if a != b]
    for r in range(len(pairs) + 1):
        for arcs in itertools.combinations(pairs, r):
            try:
                yield pbn.Dag(list(nodes), list(arcs))
            except ValueError:
                continue


def _bic_total(score, model):
    return sum(
        score.local_score(model, v, model.parents(v)) for v in model.nodes()
    )


def test_hc_reaches_global_bic_optimum():
    rng = np.random.default_rng(7)
    n = 500
    a = rng.normal(size=n)
    b = 1.5 * a + 0.5 * rng.normal(size=n)
    c = -a + b + 0.5 * rng.normal(size=n)
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    score = pbn.BIC(df)

    best = -np.inf
    count = 0
    for dag in _all_dags(["a", "b", "c"]):
        m = pbn.GaussianNetwork(["a", "b", "c"], list(dag.arcs()))
        best = max(best, _bic_total(score, m))
        count += 1
    assert count == 25  # 3-node DAG count

    learned = pbn.hc(df, bn_type=pbn.GaussianNetworkType(), score="bic")
    got = _bic_total(score, learned)
    assert np.isclose(got, best, rtol=1e-10), (got, best)
