"""Regressions for the round-3 fast paths and extension-contract edges:
reused CPDs with permuted evidence order, unfittable hybrid base factors in
ToString, custom scores without data(), KMutualInformation row guards.
"""

import numpy as np
import pandas as pd
import pytest

from data_gen import normal_chain_data
import pybnesian_tpu as pbn

DF = normal_chain_data(600, seed=31)


def test_fit_respects_reused_cpd_evidence_order():
    """A pre-added unfitted CPD may list the same parent SET in a different
    ORDER than graph.parents(); fit must bind slopes to the CPD's own
    evidence order."""
    bn = pbn.GaussianNetwork(["a", "b", "c"], [("a", "c"), ("b", "c")])
    parents = bn.parents("c")
    flipped = list(reversed(parents))
    cpd = pbn.LinearGaussianCPD("c", flipped)
    bn.add_cpds([cpd])
    assert not bn.cpd("c").fitted()
    bn.fit(DF)
    got = bn.cpd("c")
    assert got.evidence() == flipped
    ref = pbn.LinearGaussianCPD("c", flipped)
    ref.fit(DF)
    np.testing.assert_allclose(got.beta, ref.beta, rtol=1e-9)
    assert got.variance == pytest.approx(ref.variance, rel=1e-9)
    # and slogl through the fast logl matrix matches the per-factor sum
    manual = sum(bn.cpd(v).slogl(DF) for v in bn.nodes())
    assert bn.slogl(DF) == pytest.approx(manual, rel=1e-9)


def test_hybrid_tostring_with_unfittable_base():
    f = pbn.CLinearGaussianCPD("y", ["x"])
    f.fit(pd.DataFrame({"y": [1.0], "x": [2.0]}))
    s = f.ToString()
    assert "not fitted" in s  # must not crash on the None base factor


def test_custom_score_without_data_runs_hc():
    from pybnesian_tpu.learning.scores.base import Score

    class ArcCountScore(Score):
        """Scores only structure — no data behind it."""

        def local_score(self, model, variable, parents=None):
            if parents is None:
                parents = model.parents(variable)
            return -float(len(parents))

    start = pbn.GaussianNetwork(["a", "b", "c"], [("a", "b")])
    out = pbn.GreedyHillClimbing().estimate(
        pbn.ArcOperatorSet(), ArcCountScore(), start, max_iters=3
    )
    # removing the only arc is the single improving move
    assert out.num_arcs() == 0


def test_kmi_guard_includes_shuffle_neighbors():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "x": rng.normal(size=50),
            "y": rng.normal(size=50),
            "z": rng.normal(size=50),
        }
    )
    # null out all but 5 rows: 5 > k but 5 <= shuffle_neighbors
    df.loc[df.index[5:], "x"] = np.nan
    with pytest.raises(ValueError, match="shuffle_neighbors"):
        pbn.KMutualInformation(df, k=3, shuffle_neighbors=5)
