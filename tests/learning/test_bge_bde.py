import numpy as np
import pytest
from scipy.special import gammaln

from pybnesian_tpu.factors.discrete import (
    DiscreteFactorType,
    create_cardinality_strides,
    joint_counts,
)
from pybnesian_tpu.data import DataFrame
from pybnesian_tpu.learning.scores.bde import BDe
from pybnesian_tpu.learning.scores.bge import BGe
from pybnesian_tpu.learning.scores.bic import BIC
from pybnesian_tpu.models import DiscreteBN, GaussianNetwork
from data_gen import discrete_data, normal_chain_data, with_nulls


def test_bge_score_equivalence():
    """BGe is score-equivalent: a->b and b->a give the same total score."""
    df = normal_chain_data(1000)
    score = BGe(df)
    m1 = GaussianNetwork(["a", "b", "c", "d"], [("a", "b")])
    m2 = GaussianNetwork(["a", "b", "c", "d"], [("b", "a")])
    np.testing.assert_allclose(score.score(m1), score.score(m2), rtol=1e-10)


def test_bge_prefers_true_arcs():
    df = normal_chain_data(3000)
    score = BGe(df)
    m = GaussianNetwork(["a", "b", "c", "d"])
    base = score.local_score(m, "b", [])
    dep = score.local_score(m, "b", ["a"])
    indep = score.local_score(m, "b", ["d"])  # d nearly independent of b given nothing? b->c->d so correlated
    assert dep > base


def test_bge_hc_learns_structure():
    from pybnesian_tpu.learning.algorithms import hc
    from pybnesian_tpu.models import GaussianNetworkType

    df = normal_chain_data(3000)
    learned = hc(df, bn_type=GaussianNetworkType(), score="bge")
    skeleton = {frozenset(a) for a in learned.arcs()}
    assert frozenset(("a", "b")) in skeleton
    assert frozenset(("c", "d")) in skeleton


def test_bge_nu_validation():
    df = normal_chain_data(100)
    with pytest.raises(ValueError):
        BGe(df, nu=[0.0, 1.0])  # wrong length
    with pytest.raises(ValueError):
        BGe(df, iss_w=1.0)  # must be > ncols-1


def test_bde_matches_manual_formula():
    df = discrete_data(2000)
    score = BDe(df, iss=2.0)
    model = DiscreteBN(["A", "B", "C", "D"])
    wrapped = DataFrame.wrap(df)
    for var, parents in [("A", []), ("B", ["A"]), ("C", ["A", "B"])]:
        got = score.local_score_node_type(
            model, DiscreteFactorType(), var, parents
        )
        card, strides = create_cardinality_strides(wrapped, var, parents)
        counts = joint_counts(wrapped, var, parents, card, strides)
        k = int(card[0])
        prod = int(np.prod(card))
        alpha = 2.0 / prod
        c2 = counts.reshape(-1, k)
        ref = np.sum(gammaln(c2 + alpha)) - prod * gammaln(alpha)
        ref += np.sum(gammaln(alpha * k) - gammaln(alpha * k + c2.sum(1)))
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_bde_batch_matches_single():
    df = discrete_data(1500)
    score = BDe(df)
    model = DiscreteBN(["A", "B", "C", "D"])
    fams = [("A", [], None), ("B", ["A"], None), ("D", ["A", "B", "C"], None)]
    batch = score.local_score_batch(model, fams)
    for i, (v, ps, _) in enumerate(fams):
        np.testing.assert_allclose(
            batch[i], score.local_score(model, v, ps), rtol=1e-9
        )


def test_bic_discrete_batch_matches_single():
    df = discrete_data(1500)
    score = BIC(df)
    model = DiscreteBN(["A", "B", "C", "D"])
    fams = [("A", [], None), ("C", ["A", "B"], None), ("D", ["C"], None)]
    batch = score.local_score_batch(model, fams)
    for i, (v, ps, _) in enumerate(fams):
        np.testing.assert_allclose(
            batch[i], score.local_score(model, v, ps), rtol=1e-9
        )


def test_bde_hc_discrete_structure():
    from pybnesian_tpu.learning.algorithms import hc

    df = discrete_data(5000)
    learned = hc(df, start=DiscreteBN(["A", "B", "C", "D"]), score="bde")
    skeleton = {frozenset(a) for a in learned.arcs()}
    assert frozenset(("A", "B")) in skeleton
    assert frozenset(("C", "D")) in skeleton


def test_bde_with_nulls():
    import pandas as pd

    df = discrete_data(500)
    df.loc[df.index[:50], "A"] = None
    score = BDe(df)
    model = DiscreteBN(["A", "B"])
    s = score.local_score(model, "B", ["A"])
    assert np.isfinite(s)
