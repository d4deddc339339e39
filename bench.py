"""Benchmark harness: CV-likelihood score throughput on a 10k-row
semiparametric network (BASELINE.json north star, config 3).

Measures how many (family, 10-fold CV) local-score evaluations per second the
framework sustains — the hot operation of KDE/semiparametric structure search
(SURVEY.md §3.1). The baseline is the same workload executed the reference's
way: one serial scipy fit + logpdf per (family, fold), which stands in for
the reference's single-device OpenCL pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent XLA compile cache: this environment's remote TPU compiles are
# slow and highly variable; caching makes repeat benchmark runs honest about
# steady-state throughput
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_data(n=10_000, d=5, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    cols = {}
    base = rng.normal(0, 1, n)
    for i in range(d):
        noise = rng.normal(0, 0.6, n)
        if i == 0:
            cols[f"x{i}"] = base + noise
        else:
            prev = cols[f"x{i-1}"]
            cols[f"x{i}"] = np.sin(0.8 * prev) + 0.5 * prev + noise
    import pandas as pd

    return pd.DataFrame({k: v.astype(dtype) for k, v in cols.items()})


def families(d, shift=1):
    fams = []
    names = [f"x{i}" for i in range(d)]
    for i, v in enumerate(names):
        fams.append((v, []))
        fams.append((v, [names[(i + shift) % d]]))
        fams.append((v, [names[(i + shift) % d], names[(i + shift + 1) % d]]))
    return fams


def bench_ours(df, fams, k=10):
    from pybnesian_tpu.factors.ckde import CKDEType
    from pybnesian_tpu.learning.scores.likelihood import CVLikelihood
    from pybnesian_tpu.models import KDENetwork

    score = CVLikelihood(df, k=k, seed=0)
    model = KDENetwork([c for c in df.columns])
    ckde = CKDEType()
    d = df.shape[1]

    def run_once(shift):
        # the structure-search path: all candidate families in batched
        # device launches (Score.local_score_batch). The family set is
        # rotated per rep — same shapes (no recompile), different gather
        # indices — so repeat dispatches cannot be served from any
        # result cache on the remote backend (CLAUDE.md timing trap);
        # this mirrors hill-climbing, which re-scores changing candidate
        # sets against a fixed score instance.
        batch = [(v, ps, ckde) for v, ps in families(d, shift)]
        return float(score.local_score_batch(model, batch).sum())

    t0 = time.time()
    warm_total = run_once(1)  # includes compile
    warmup = time.time() - t0

    # valid shifts are 1..d-2 (shift+1 == d would make a family its own
    # parent); warm used 1, reps use the rest — every rep distinct
    reps = max(1, min(3, d - 3))
    t0 = time.time()
    for r in range(reps):
        run_once(2 + r)
    elapsed = (time.time() - t0) / reps
    return len(fams) / elapsed, warmup, warm_total


def bench_baseline_faithful(df, fams, k=10, max_fams=4):
    """Vectorized numpy implementation of the reference's EXACT kernel
    sequence (kde/KDE.hpp:592-640 + CKDE.hpp:202-254), per (family, fold):
    normal-reference bandwidth from the train covariance, Cholesky,
    triangular-solve whitening, pairwise subtract/square distances,
    logsumexp — joint and marginal — then the conditional subtraction. This
    is a much closer stand-in for the reference's OpenCL pipeline than
    scipy.gaussian_kde (same math, numpy's vectorized C loops standing in
    for the GPU kernels)."""
    from scipy.linalg import solve_triangular
    from scipy.special import logsumexp

    n = len(df)
    rng = np.random.default_rng(0)
    idx = rng.permutation(n)
    folds = np.array_split(idx, k)
    sub = fams[:max_fams]

    def kde_logl(train, test):
        nt, d = train.shape
        kfac = (4.0 / (nt * (d + 2.0))) ** (2.0 / (d + 4.0))
        H = kfac * np.cov(train, rowvar=False, ddof=1).reshape(d, d)
        L = np.linalg.cholesky(H)
        tw = solve_triangular(L, train.T, lower=True).T
        sw = solve_triangular(L, test.T, lower=True).T
        # pairwise d² via the matmul identity (one BLAS gemm) — the fastest
        # CPU form of the reference's subtract/square kernel sequence
        d2 = (
            np.sum(sw * sw, axis=1)[:, None]
            - 2.0 * (sw @ tw.T)
            + np.sum(tw * tw, axis=1)[None, :]
        )
        lognorm = (
            -np.sum(np.log(np.diag(L)))
            - 0.5 * d * np.log(2 * np.pi)
            - np.log(nt)
        )
        return logsumexp(-0.5 * d2, axis=1) + lognorm

    t0 = time.time()
    for v, ps in sub:
        cols = [v, *ps]
        mat = df[cols].to_numpy().astype(np.float64)
        for f in range(k):
            test_idx = folds[f]
            train_idx = np.concatenate([folds[j] for j in range(k) if j != f])
            train = mat[train_idx]
            test = mat[test_idx]
            ll = kde_logl(train, test)
            if ps:
                ll = ll - kde_logl(train[:, 1:], test[:, 1:])
            float(ll.sum())
    elapsed = time.time() - t0
    return len(sub) / elapsed


def bench_baseline(df, fams, k=10, max_fams=4):
    """Reference-style serial loop: scipy gaussian_kde per (family, fold)."""
    from scipy.stats import gaussian_kde

    n = len(df)
    rng = np.random.default_rng(0)
    idx = rng.permutation(n)
    folds = np.array_split(idx, k)
    sub = fams[:max_fams]
    t0 = time.time()
    for v, ps in sub:
        cols = [v, *ps]
        mat = df[cols].to_numpy().astype(np.float64)
        for f in range(k):
            test_idx = folds[f]
            train_idx = np.concatenate([folds[j] for j in range(k) if j != f])
            train = mat[train_idx]
            test = mat[test_idx]
            joint = gaussian_kde(train.T, bw_method="silverman")
            ll = joint.logpdf(test.T)
            if ps:
                marg = gaussian_kde(train[:, 1:].T, bw_method="silverman")
                ll = ll - marg.logpdf(test[:, 1:].T)
            float(ll.sum())
    elapsed = time.time() - t0
    return len(sub) / elapsed


def assert_kernel_parity():
    """Every bench round proves which kernel ran and that it is numerically
    right on the real hardware: on TPU the Pallas flash kernel must agree
    with the XLA fused kernel (the scoring path refuses to use an unverified
    flash kernel — learning/scores/likelihood.py _flash_cv_usable)."""
    import jax

    if jax.default_backend() != "tpu":
        return "cpu"
    from pybnesian_tpu.ops.kde import flash_cv_selfcheck

    ok, diff = flash_cv_selfcheck()
    if not ok:
        raise AssertionError(
            f"flash/XLA CV kernel parity check failed (max abs diff {diff})"
        )
    return "flash"


def measure_exp_roofline() -> float:
    """In-process f32 exp throughput (exps/s): the hardware ceiling the
    CV kernel's transcendental mix is audited against. Re-measured every
    run (a few seconds) so the reported fraction tracks the actual chip,
    not a stale constant (benchmarks/micro_exp_roofline.py is the full
    study)."""
    import sys as _sys

    _sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    )
    from micro_exp_roofline import ITERS, SHAPE, bare_exp_sum, timeit

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    t = timeit(bare_exp_sum, x)
    return SHAPE[0] * SHAPE[1] * ITERS / t


def main():
    df = make_data()
    fams = families(df.shape[1])

    assert_kernel_parity()
    ours_rate, warmup, total = bench_ours(df, fams)
    faithful_rate = bench_baseline_faithful(df, fams)
    scipy_rate = bench_baseline(df, fams)
    try:
        exp_rate = measure_exp_roofline()
    except Exception:
        exp_rate = None

    # hardware self-audit: exp-equivalents accomplished per second vs the
    # measured pure-exp rate. The nominal workload is k folds × ntr × nte
    # pairs per family at ~1.6 exps/pair (joint 1 + marginal 1, with the
    # marginal skipped for parentless families — docs/PERFORMANCE.md).
    # Values ≥ 1 are real: the streaming flash kernel amortizes VMEM
    # traffic better than a pure XLA elementwise exp chain.
    n = len(df)
    k = 10
    pairs_per_fs = k * (n - n // k) * (n // k)
    roofline_fraction = (
        round(ours_rate * pairs_per_fs * 1.6 / exp_rate, 2)
        if exp_rate
        else None
    )

    # vs_baseline is measured against the STRICTER (faster) of the two
    # serial stand-ins for the reference's OpenCL pipeline: a faithful
    # vectorized numpy port of its exact kernel sequence, and
    # scipy.gaussian_kde. Both raw ratios are reported.
    best_base = max(faithful_rate, scipy_rate)
    print(
        json.dumps(
            {
                "metric": "cvlik_ckde_family_scores_per_s_10k_rows",
                "value": round(ours_rate, 3),
                "unit": "family-scores/s (10-fold CV, 10k rows)",
                "vs_baseline": round(ours_rate / best_base, 2),
                "vs_faithful_numpy": round(ours_rate / faithful_rate, 2),
                "vs_scipy_kde": round(ours_rate / scipy_rate, 2),
                "roofline_fraction": roofline_fraction,
                "roofline_basis": "exp-equivalents/s vs in-process pure-exp rate" if roofline_fraction else None,
            }
        )
    )


if __name__ == "__main__":
    main()
