"""Python-subclass extension contract: user-defined FactorType/Factor/Score/
BandwidthSelector used inside the framework's algorithms (mirrors reference
tests/factors/factor_type_test.py and tests/learning/operators tests)."""

import numpy as np
import pytest

from pybnesian_tpu import (
    CKDE,
    BandwidthSelector,
    GreedyHillClimbing,
    ArcOperatorSet,
    HomogeneousBN,
    hc,
)
from data_gen import normal_chain_data
from tests_ext_helpers import NodeCountScore, OracleFactor, OracleFactorType


def test_user_factor_in_homogeneous_network():
    df = normal_chain_data(200)
    bn = HomogeneousBN(OracleFactorType(), ["a", "b", "c", "d"], [("a", "b")])
    bn.fit(df)
    assert isinstance(bn.cpd("b"), OracleFactor)
    ll = bn.logl(df)
    assert np.isfinite(ll).all()
    s = bn.sample(100, seed=0)
    assert s.num_rows == 100


def test_user_score_drives_hc():
    df = normal_chain_data(200)
    score = NodeCountScore(df)
    from pybnesian_tpu.models import GaussianNetwork

    start = GaussianNetwork(["a", "b", "c", "d"])
    learned = GreedyHillClimbing().estimate(
        ArcOperatorSet(), score, start, max_iters=20
    )
    # the score rewards parents up to 2: every node should end with <= 2
    # parents and the search should add arcs
    assert learned.num_arcs() > 0
    for n in learned.nodes():
        assert learned.num_parents(n) <= 2


def test_user_bandwidth_selector_in_ckde():
    calls = []

    class FixedBandwidth(BandwidthSelector):
        def bandwidth(self, df, variables):
            calls.append(tuple(variables))
            return np.eye(len(variables)) * 0.5

        def diag_bandwidth(self, df, variables):
            return np.full(len(variables), 0.5)

    df = normal_chain_data(150)
    ckde = CKDE("b", ["a"], FixedBandwidth())
    ckde.fit(df)
    assert calls  # selector was consulted
    np.testing.assert_allclose(ckde.kde_joint().bandwidth, np.eye(2) * 0.5)
    ll = ckde.logl(df.head(20))
    assert np.isfinite(ll).all()


def test_user_score_via_hc_entry():
    df = normal_chain_data(150)
    learned = hc(df, score=NodeCountScore(df))
    assert learned.num_arcs() > 0
