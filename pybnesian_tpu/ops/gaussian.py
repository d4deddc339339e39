"""Device kernels for linear-Gaussian factors and scores.

The TPU-first replacement for the reference's per-family Eigen closed forms
(reference learning/parameters/mle_LinearGaussianCPD.{hpp,cpp} and
learning/scores/bic.cpp:12-27). Instead of fitting one family at a time on
host, *batches of candidate families* (the unit of work of structure search)
are evaluated in a single vmapped kernel:

- each family (variable, parent-set) is encoded as a variable index + padded
  parent-index vector + 0/1 parent mask (ragged parent sets → static shapes);
- null handling is a per-row validity weight (product of the family columns'
  validity), reproducing the reference's pairwise-deletion semantics
  (dataset/dataset.hpp:238-335) without dynamic shapes;
- sufficient statistics are one masked Gram matrix per family — an (n × p)
  matmul that XLA tiles onto the MXU — followed by a tiny masked solve.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)
_MACHINE_TOL = 2.220446049250313e-16 * 4


def _family_design(values, valid, var_idx, parent_idx, parent_mask):
    """Design matrix [1, parents(masked), y] (n, P+2) and row weights (n,)."""
    n = values.shape[0]
    y = values[:, var_idx]
    X = values[:, parent_idx] * parent_mask[None, :]
    w = valid[:, var_idx] * jnp.prod(
        jnp.where(parent_mask[None, :] > 0, valid[:, parent_idx], 1.0), axis=1
    )
    ones = jnp.ones((n, 1), values.dtype)
    design = jnp.concatenate([ones, X, y[:, None]], axis=1)
    return design, w


@jax.jit
def family_grams(values, valid, var_idx, parent_idx, parent_mask):
    """Masked Gram matrices for F families.

    values: (n, D) data (nulls zeroed), valid: (n, D) 0/1 validity,
    var_idx: (F,) int, parent_idx: (F, P) int, parent_mask: (F, P) 0/1.
    Returns grams (F, P+2, P+2) over columns [1, parents, y] and n_eff (F,).
    """

    def one(vi, pi, pm):
        design, w = _family_design(values, valid, vi, pi, pm)
        gram = jnp.einsum(
            "ni,nj->ij", design * w[:, None], design,
            preferred_element_type=design.dtype,
        )
        return gram, jnp.sum(w)

    return jax.vmap(one)(var_idx, parent_idx, parent_mask)


def lg_params_from_gram(gram, parent_mask, n_eff):
    """(beta, variance, rss) from one family Gram (reference
    mle_LinearGaussianCPD.hpp closed forms, generalized).

    beta is padded to P+1 entries [intercept, slopes]; masked-out parents get
    slope 0. variance = RSS / (n - k - 1), +inf when underdetermined
    (mle_LinearGaussianCPD.hpp:203-230, :173-186)."""
    P = parent_mask.shape[0]
    m = jnp.concatenate([jnp.ones((1,), gram.dtype), parent_mask])
    A = gram[: P + 1, : P + 1] * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    b = gram[: P + 1, P + 1] * m
    yy = gram[P + 1, P + 1]
    # Gram matrices are SPD: Cholesky solve (TPU supports it at every dtype,
    # unlike LU decomposition) and it is the faster path on the MXU.
    chol = jnp.linalg.cholesky(A)
    beta = jax.scipy.linalg.cho_solve((chol, True), b)
    rss = yy - beta @ b
    rss = jnp.maximum(rss, 0.0)
    k = jnp.sum(parent_mask)
    dof = n_eff - k - 1.0
    variance = jnp.where(dof > 0, rss / jnp.maximum(dof, 1.0), jnp.inf)
    return beta, variance, rss


@jax.jit
def batched_lg_params(grams, parent_mask, n_eff):
    return jax.vmap(lg_params_from_gram)(grams, parent_mask, n_eff)


def bic_from_gram(gram, parent_mask, n_eff):
    """Gaussian BIC local score from a family Gram
    (formula: reference learning/scores/bic.cpp:12-27)."""
    _, variance, _ = lg_params_from_gram(gram, parent_mask, n_eff)
    k = jnp.sum(parent_mask)
    n = n_eff
    loglik = (
        0.5 * (1.0 + k - n) - 0.5 * n * LOG_2PI - 0.5 * n * jnp.log(variance)
    )
    score = loglik - 0.5 * jnp.log(n) * (k + 2.0)
    bad = (
        (variance < _MACHINE_TOL)
        | ~jnp.isfinite(variance)
        | ~jnp.isfinite(score)
    )
    return jnp.where(bad, -jnp.inf, score)


@jax.jit
def batched_bic(values, valid, var_idx, parent_idx, parent_mask):
    """BIC local score for F candidate families in one device call."""
    grams, n_eff = family_grams(values, valid, var_idx, parent_idx, parent_mask)
    return jax.vmap(bic_from_gram)(grams, parent_mask, n_eff)


@jax.jit
def batched_lg_cv_loglik(values, valid, train_mask, test_mask, var_idx,
                         parent_idx, parent_mask):
    """k-fold CV log-likelihood of F linear-Gaussian families in ONE device
    call — the batched replacement for the reference's per-(family, fold)
    serial fit+slogl loop (learning/scores/cv_likelihood.cpp:11-25).

    train_mask/test_mask: (K, n) 0/1 row masks per fold (rows excluded from
    the CV — e.g. null rows — are 0 in both). Returns (F,) summed test
    log-likelihood across folds; -inf when any fold is degenerate."""

    def one_family(vi, pi, pm):
        design, w = _family_design(values, valid, vi, pi, pm)
        y = design[:, -1]

        def one_fold(tm, sm):
            wtr = w * tm
            gram = jnp.einsum(
                "ni,nj->ij", design * wtr[:, None], design,
                preferred_element_type=design.dtype,
            )
            beta, variance, _ = lg_params_from_gram(gram, pm, jnp.sum(wtr))
            mean = design[:, :-1] @ beta
            ll = (
                -0.5 * jnp.square(y - mean) / variance
                - 0.5 * jnp.log(variance)
                - 0.5 * LOG_2PI
            )
            wte = w * sm
            fold_ll = jnp.sum(ll * wte)
            bad = (variance < _MACHINE_TOL) | ~jnp.isfinite(variance)
            return jnp.where(bad, -jnp.inf, fold_ll)

        return jnp.sum(jax.vmap(one_fold)(train_mask, test_mask))

    return jax.vmap(one_family)(var_idx, parent_idx, parent_mask)


@jax.jit
def batched_lg_holdout_loglik(train_values, train_valid, test_values,
                              test_valid, var_idx, parent_idx, parent_mask):
    """Fit on training split, slogl on test split, batched over F families
    (reference learning/scores/holdout_likelihood.cpp)."""
    grams, n_eff = family_grams(
        train_values, train_valid, var_idx, parent_idx, parent_mask
    )
    betas, variances, _ = jax.vmap(lg_params_from_gram)(
        grams, parent_mask, n_eff
    )

    def one(vi, pi, pm, beta, variance):
        design, w = _family_design(test_values, test_valid, vi, pi, pm)
        y = design[:, -1]
        mean = design[:, :-1] @ beta
        ll = (
            -0.5 * jnp.square(y - mean) / variance
            - 0.5 * jnp.log(variance)
            - 0.5 * LOG_2PI
        )
        total = jnp.sum(ll * w)
        bad = (variance < _MACHINE_TOL) | ~jnp.isfinite(variance)
        return jnp.where(bad, -jnp.inf, total)

    return jax.vmap(one)(var_idx, parent_idx, parent_mask, betas, variances)


@jax.jit
def lg_logl(y, X, beta, variance):
    """Per-row log N(y | beta0 + X·beta[1:], variance)
    (reference LinearGaussianCPD.cpp:93-119)."""
    mean = beta[0] + X @ beta[1:]
    return (
        -0.5 * jnp.square(y - mean) / variance
        - 0.5 * jnp.log(variance)
        - 0.5 * LOG_2PI
    )


@partial(jax.jit, static_argnames=("batch",))
def batched_lg_logl(values, valid, var_idx, parent_idx, parent_mask, betas,
                    variances, batch=None):
    """slogl of F fitted LG families over the same data in one call.

    Returns (F,) sums over valid rows. Used by CV/holdout likelihood scoring."""

    def one(vi, pi, pm, beta, var):
        y = values[:, vi]
        X = values[:, pi] * pm[None, :]
        w = valid[:, vi] * jnp.prod(
            jnp.where(pm[None, :] > 0, valid[:, pi], 1.0), axis=1
        )
        ll = lg_logl(y, X, beta, var)
        return jnp.sum(ll * w)

    return jax.vmap(one)(var_idx, parent_idx, parent_mask, betas, variances)
