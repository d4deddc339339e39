"""BASELINE config 5 structure part: DMMHC over mixed (CLG) dynamic data."""

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu import (
    CLGNetworkType,
    DMMHC,
    DynamicDataFrame,
    DynamicMutualInformation,
    PC,
    LinearCorrelation,
)
from pybnesian_tpu.learning.scores.dynamic import DynamicBIC


def regime_series(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    s = np.zeros(n)
    regime = np.empty(n, object)
    regime[0] = "low"
    for t in range(1, n):
        regime[t] = (
            "high" if (s[t - 1] > 0.5) ^ (rng.random() < 0.1) else "low"
        )
        drift = 0.5 if regime[t] == "high" else -0.2
        s[t] = 0.7 * s[t - 1] + drift + rng.normal(0, 0.3)
    return pd.DataFrame(
        {"regime": pd.Categorical(regime.tolist()), "s": s}
    )


def test_dmmhc_clg_end_to_end():
    df = regime_series()
    ddf = DynamicDataFrame(df, 1)
    model = DMMHC().estimate(
        DynamicMutualInformation(ddf),
        bn_type=CLGNetworkType(),
        markovian_order=1,
        score=DynamicBIC(ddf),
        alpha=0.05,
    )
    tarcs = model.transition_bn().arcs()
    # autoregression and the regime effect on s must be found
    assert ("s_t_1", "s_t_0") in tarcs
    assert ("regime_t_0", "s_t_0") in tarcs
    model.fit(ddf)
    assert model.fitted()
    ll = model.logl(df.head(100))
    assert np.isfinite(ll[1:]).all()
    samp = model.sample(50, seed=0).to_pandas()
    assert list(samp.columns) == ["regime", "s"]
    assert len(samp) == 50


def test_pc_conditional_interface():
    from data_gen import normal_chain_data

    df = normal_chain_data(4000)
    pdag = PC().estimate_conditional(
        LinearCorrelation(df), ["c", "d"], ["a", "b"], alpha=0.05
    )
    assert set(pdag.interface_nodes()) == {"a", "b"}
    # interface edges resolved into interface -> node arcs
    for (s, t) in pdag.arcs():
        if pdag.is_interface(s):
            assert not pdag.is_interface(t)
    assert not any(
        pdag.is_interface(u) and pdag.is_interface(v)
        for (u, v) in pdag.edges()
    )
    # b -> c must be detected (strong dependence)
    connected = {frozenset(x) for x in pdag.arcs()} | {
        frozenset(x) for x in pdag.edges()
    }
    assert frozenset(("b", "c")) in connected
    assert frozenset(("c", "d")) in connected
