import numpy as np
import pytest

from pybnesian_tpu.graph import Dag
from pybnesian_tpu.graph.closure import (
    add_arc_legality,
    has_path,
    native_available,
    topological_order,
    transitive_closure,
)


def random_dag_adj(n, p, seed):
    rng = np.random.default_rng(seed)
    adj = np.zeros((n, n), bool)
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                adj[i, j] = True
    perm = rng.permutation(n)
    return adj[np.ix_(perm, perm)]


def closure_bruteforce(adj):
    n = adj.shape[0]
    reach = adj.astype(bool).copy()
    for k in range(n):
        for i in range(n):
            if reach[i, k]:
                reach[i] |= reach[k]
    return reach


def test_native_compiles():
    assert native_available(), "C++ graph core failed to build"


@pytest.mark.parametrize("n,seed", [(5, 0), (23, 1), (70, 2), (130, 3)])
def test_closure_matches_bruteforce(n, seed):
    adj = random_dag_adj(n, 0.15, seed)
    np.testing.assert_array_equal(
        transitive_closure(adj), closure_bruteforce(adj)
    )


def test_has_path_matches_closure():
    adj = random_dag_adj(40, 0.1, 4)
    closure = closure_bruteforce(adj)
    rng = np.random.default_rng(0)
    for _ in range(50):
        s, t = rng.integers(0, 40, 2)
        expected = bool(closure[s, t]) if s != t else True
        assert has_path(adj, int(s), int(t)) == expected


def test_topological_order():
    adj = random_dag_adj(50, 0.12, 5)
    order = topological_order(adj)
    assert order is not None
    pos = {v: i for i, v in enumerate(order)}
    for s, t in zip(*np.nonzero(adj)):
        assert pos[int(s)] < pos[int(t)]
    # cycle detection
    cyc = np.zeros((3, 3), bool)
    cyc[0, 1] = cyc[1, 2] = cyc[2, 0] = True
    assert topological_order(cyc) is None


def test_add_arc_legality_matches_dag_semantics():
    names = [f"n{i}" for i in range(12)]
    adj = random_dag_adj(12, 0.2, 6)
    dag = Dag(names)
    for s, t in zip(*np.nonzero(adj)):
        dag.add_arc_unsafe(names[s], names[t])
    legal = add_arc_legality(adj)
    for s in range(12):
        for t in range(12):
            if s == t or adj[s, t]:
                continue
            # adding s->t is illegal iff a path t ~> s exists
            assert legal[s, t] == dag.can_add_arc(names[s], names[t])
