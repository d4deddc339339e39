"""Native discrete-BIC hill-climbing (discretecore dc_hc) vs the Python
loop: the fast path must reproduce the Python search decision-for-decision
(same quantized deltas, same find_max tie-breaking, same stop conditions),
so the learned structure is identical. Reference analog: the whole loop is
C++ there too (hillclimbing.hpp:62-199, operators.cpp:100-437)."""

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu import BIC, ArcOperatorSet, DiscreteBN
from pybnesian_tpu.learning.algorithms import GreedyHillClimbing
import pybnesian_tpu.learning.algorithms.hillclimbing as hcmod
from pybnesian_tpu.learning.scores import discrete_native


def _disc_df(n=1500, d=8, card=3, seed=0):
    rng = np.random.default_rng(seed)
    cols = {}
    prev = rng.integers(0, card, n)
    for i in range(d):
        cur = np.where(rng.random(n) < 0.35, rng.integers(0, card, n), prev)
        cols[f"v{i}"] = pd.Categorical.from_codes(
            cur, [str(c) for c in range(card)]
        )
        prev = cur
    return pd.DataFrame(cols)


def _run_both(df, **kw):
    score = BIC(df)
    model = DiscreteBN(list(df.columns))
    native = GreedyHillClimbing().estimate(
        ArcOperatorSet(), score, model, **kw
    )
    orig = hcmod._native_discrete_hc
    hcmod._native_discrete_hc = lambda *a, **k: None
    try:
        python = GreedyHillClimbing().estimate(
            ArcOperatorSet(), score, model, **kw
        )
    finally:
        hcmod._native_discrete_hc = orig
    return native, python


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_hc_matches_python_loop():
    for seed in (0, 1, 2):
        df = _disc_df(seed=seed)
        native, python = _run_both(df)
        assert sorted(native.arcs()) == sorted(python.arcs())


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_hc_restrictions_and_caps():
    df = _disc_df(seed=3)
    kw = dict(
        arc_blacklist=[("v0", "v1")],
        arc_whitelist=[("v2", "v3")],
        max_indegree=2,
        max_iters=6,
    )
    native, python = _run_both(df, **kw)
    assert sorted(native.arcs()) == sorted(python.arcs())
    assert native.has_arc("v2", "v3")
    assert not native.has_arc("v0", "v1")
    assert max(native.num_parents(n) for n in native.nodes()) <= 2


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_hc_epsilon_stops_early():
    df = _disc_df(seed=4)
    native, python = _run_both(df, epsilon=1e9)
    assert native.num_arcs() == python.num_arcs() == 0


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_hc_nulls_fall_back_consistently():
    df = _disc_df(seed=5)
    df.loc[::13, "v1"] = None
    native, python = _run_both(df)
    assert sorted(native.arcs()) == sorted(python.arcs())


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_callback_and_patience_use_python_loop():
    """Validated/patience/callback searches must NOT route native."""
    from pybnesian_tpu import CVLikelihood

    df = _disc_df(seed=6)
    score = CVLikelihood(df, 5)
    model = DiscreteBN(list(df.columns))
    learned = GreedyHillClimbing().estimate(
        ArcOperatorSet(), score, model, patience=1, max_iters=4
    )
    assert learned.num_arcs() >= 0  # ran the generic loop without error


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_hc_bde_matches_python_loop():
    from pybnesian_tpu import BDe

    for iss, seed in ((1.0, 7), (4.0, 8)):
        df = _disc_df(seed=seed)
        score = BDe(df, iss=iss)
        model = DiscreteBN(list(df.columns))
        native = GreedyHillClimbing().estimate(
            ArcOperatorSet(), score, model, max_iters=10
        )
        orig = hcmod._native_discrete_hc
        hcmod._native_discrete_hc = lambda *a, **k: None
        try:
            python = GreedyHillClimbing().estimate(
                ArcOperatorSet(), score, model, max_iters=10
            )
        finally:
            hcmod._native_discrete_hc = orig
        assert sorted(native.arcs()) == sorted(python.arcs())


@pytest.mark.skipif(not discrete_native.available(), reason="no toolchain")
def test_native_bde_batch_matches_serial():
    from pybnesian_tpu import BDe, DiscreteFactorType

    df = _disc_df(seed=9)
    score = BDe(df, iss=2.5)
    model = DiscreteBN(list(df.columns))
    fams = [("v3", ["v1", "v5"]), ("v0", []), ("v2", ["v7"]),
            ("v1", ["v0", "v2", "v3"])]
    batch = score.local_score_batch(model, fams)
    serial = np.array([
        score.local_score_node_type(model, DiscreteFactorType(), v, ps)
        for v, ps in fams
    ])
    np.testing.assert_allclose(batch, serial, rtol=1e-10)
