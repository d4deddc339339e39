import numpy as np
import pytest

from pybnesian_tpu import KDE, UCV, NormalReferenceRule
from pybnesian_tpu.kde.ucv import UCVScorer, invvech_triangular, vech
from data_gen import normal_chain_data


def test_vech_roundtrip():
    L = np.array([[2.0, 0.0], [0.5, 1.5]])
    v = vech(L)
    np.testing.assert_array_equal(v, [2.0, 0.5, 1.5])
    np.testing.assert_array_equal(invvech_triangular(v), L)


def test_ucv_score_matches_bruteforce():
    """Device pair-triangle sums equal the O(N^2) numpy UCV objective."""
    df = normal_chain_data(300)
    scorer = UCVScorer(df, ["a", "b"])
    H = NormalReferenceRule().bandwidth(df, ["a", "b"])
    got = scorer.score_unconstrained(H)

    X = scorer.training
    N, d = X.shape
    L = np.linalg.cholesky(H)
    from scipy.linalg import solve_triangular

    W = solve_triangular(L, X.T, lower=True).T
    d2 = ((W[:, None, :] - W[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(N, 1)
    lognorm_h = -np.log(np.diag(L)).sum() - 0.5 * d * np.log(2 * np.pi)
    lognorm_2h = lognorm_h - 0.5 * d * np.log(2)
    s2h = np.exp(-0.25 * d2[iu]).sum() * np.exp(lognorm_2h)
    sh = np.exp(-0.5 * d2[iu]).sum() * np.exp(lognorm_h)
    expected = np.exp(lognorm_2h) + 2 * s2h / N - 4 * sh / (N - 1)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_ucv_improves_score_over_start():
    df = normal_chain_data(400)
    scorer = UCVScorer(df, ["a", "b"])
    start = NormalReferenceRule().bandwidth(df, ["a", "b"])
    H = UCV().bandwidth(df, ["a", "b"])
    assert H.shape == (2, 2)
    # symmetric PSD
    np.testing.assert_allclose(H, H.T)
    assert np.all(np.linalg.eigvalsh(H) > 0)
    assert scorer.score_unconstrained(H) <= scorer.score_unconstrained(start) + 1e-12


def test_ucv_diag():
    df = normal_chain_data(300)
    diag = UCV().diag_bandwidth(df, ["a", "b"])
    assert diag.shape == (2,)
    assert np.all(diag > 0)


def test_kde_with_ucv_selector():
    df = normal_chain_data(300)
    kde = KDE(["a", "b"], UCV())
    kde.fit(df)
    test = normal_chain_data(50, seed=5)
    ll = kde.logl(test)
    assert np.isfinite(ll).all()
