import numpy as np
import pytest

from pybnesian_tpu import (
    DMMHC,
    MMHC,
    MMPC,
    GaussianNetworkType,
    LinearCorrelation,
)
from pybnesian_tpu.learning.independences.linearcorrelation import (
    DynamicLinearCorrelation,
)
from data_gen import normal_chain_data, normal_indep_data


def test_mmpc_recovers_skeleton():
    df = normal_chain_data(5000)
    pdag = MMPC().estimate(LinearCorrelation(df), alpha=0.05)
    connected = {frozenset(e) for e in pdag.edges()} | {
        frozenset(a) for a in pdag.arcs()
    }
    assert frozenset(("a", "b")) in connected
    assert frozenset(("b", "c")) in connected
    assert frozenset(("c", "d")) in connected
    assert frozenset(("b", "d")) not in connected


def test_mmpc_independent_data():
    df = normal_indep_data(3000)
    pdag = MMPC().estimate(LinearCorrelation(df), alpha=0.01)
    assert pdag.num_edges() + pdag.num_arcs() <= 1


def test_mmhc_learns_dag():
    df = normal_chain_data(4000)
    model = MMHC().estimate(
        LinearCorrelation(df), bn_type=GaussianNetworkType(), score="bic",
        alpha=0.05,
    )
    assert model.num_arcs() >= 3
    skeleton = {frozenset(a) for a in model.arcs()}
    assert frozenset(("a", "b")) in skeleton
    assert frozenset(("c", "d")) in skeleton
    # hc respects the MMPC skeleton: no arc between b and d
    assert frozenset(("b", "d")) not in skeleton


def test_dmmhc_builds_dynamic_model():
    from pybnesian_tpu import DynamicDataFrame
    from pybnesian_tpu.learning.scores.dynamic import DynamicBIC

    rng = np.random.default_rng(0)
    n = 1500
    a = np.zeros(n)
    b = np.zeros(n)
    for t in range(1, n):
        a[t] = 0.8 * a[t - 1] + rng.normal(0, 0.5)
        b[t] = 0.7 * a[t - 1] + 0.2 * b[t - 1] + rng.normal(0, 0.5)
    import pandas as pd

    df = pd.DataFrame({"a": a, "b": b})
    ddf = DynamicDataFrame(df, 1)
    test = DynamicLinearCorrelation(ddf)
    score = DynamicBIC(ddf)
    model = DMMHC().estimate(
        test, bn_type=GaussianNetworkType(), markovian_order=1, score=score,
        alpha=0.05,
    )
    assert model.markovian_order() == 1
    # transition must include a_t_1 -> a_t_0 (strong autocorrelation)
    tarcs = model.transition_bn().arcs()
    assert ("a_t_1", "a_t_0") in tarcs
    assert ("a_t_1", "b_t_0") in tarcs
    # model can be fitted and sampled end to end
    model.fit(ddf)
    assert model.fitted()
    ll = model.logl(df.head(100))
    assert np.isfinite(ll[1:]).all()
    s = model.sample(50, seed=0).to_pandas()
    assert list(s.columns) == ["a", "b"]
    assert len(s) == 50
