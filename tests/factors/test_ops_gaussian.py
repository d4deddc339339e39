import numpy as np
import jax.numpy as jnp

from pybnesian_tpu.data import DataFrame
from pybnesian_tpu.learning.parameters import mle_lineargaussian
from pybnesian_tpu.ops.gaussian import (
    batched_bic,
    batched_lg_params,
    family_grams,
)
from data_gen import normal_chain_data, with_nulls


def _families(df, fams, P):
    names = df.column_names()
    pos = {n: i for i, n in enumerate(names)}
    var_idx = np.array([pos[v] for v, _ in fams], np.int32)
    parent_idx = np.zeros((len(fams), P), np.int32)
    parent_mask = np.zeros((len(fams), P))
    for f, (_, ps) in enumerate(fams):
        for j, p in enumerate(ps):
            parent_idx[f, j] = pos[p]
            parent_mask[f, j] = 1.0
    return var_idx, parent_idx, parent_mask


def test_batched_params_match_host_mle():
    pdf = normal_chain_data(3000)
    df = DataFrame.wrap(pdf)
    values, valid = df.device_matrix(df.column_names())
    fams = [("a", []), ("b", ["a"]), ("c", ["a", "b"]), ("d", ["a", "b", "c"])]
    vi, pi, pm = _families(df, fams, P=3)
    grams, n_eff = family_grams(values, valid, vi, jnp.asarray(pi), jnp.asarray(pm))
    betas, variances, _ = batched_lg_params(grams, jnp.asarray(pm), n_eff)
    for f, (v, ps) in enumerate(fams):
        ref = mle_lineargaussian(df, v, ps)
        np.testing.assert_allclose(
            np.asarray(betas[f])[: len(ps) + 1], ref.beta, rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            float(variances[f]), ref.variance, rtol=1e-6
        )


def test_batched_params_with_nulls():
    pdf = with_nulls(normal_chain_data(2000), frac=0.15)
    df = DataFrame.wrap(pdf)
    values, valid = df.device_matrix(df.column_names())
    fams = [("b", ["a"]), ("c", ["b", "d"])]
    vi, pi, pm = _families(df, fams, P=2)
    grams, n_eff = family_grams(values, valid, vi, jnp.asarray(pi), jnp.asarray(pm))
    betas, variances, _ = batched_lg_params(grams, jnp.asarray(pm), n_eff)
    for f, (v, ps) in enumerate(fams):
        ref = mle_lineargaussian(df, v, ps)
        np.testing.assert_allclose(
            np.asarray(betas[f])[: len(ps) + 1], ref.beta, rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(float(variances[f]), ref.variance, rtol=1e-6)
        assert float(n_eff[f]) == df.valid_rows(v, *ps)


def test_batched_bic_matches_formula():
    pdf = normal_chain_data(1000)
    df = DataFrame.wrap(pdf)
    values, valid = df.device_matrix(df.column_names())
    fams = [("a", []), ("c", ["a", "b"])]
    vi, pi, pm = _families(df, fams, P=2)
    scores = batched_bic(values, valid, vi, jnp.asarray(pi), jnp.asarray(pm))
    for f, (v, ps) in enumerate(fams):
        ref = mle_lineargaussian(df, v, ps)
        n = df.valid_rows(v, *ps)
        k = len(ps)
        loglik = (
            0.5 * (1 + k - n)
            - 0.5 * n * np.log(2 * np.pi)
            - 0.5 * n * np.log(ref.variance)
        )
        expected = loglik - np.log(n) * 0.5 * (k + 2)
        np.testing.assert_allclose(float(scores[f]), expected, rtol=1e-8)
