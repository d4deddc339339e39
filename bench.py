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


def main():
    df = make_data()
    fams = families(df.shape[1])

    ours_rate, warmup, total = bench_ours(df, fams)
    base_rate = bench_baseline(df, fams)

    print(
        json.dumps(
            {
                "metric": "cvlik_ckde_family_scores_per_s_10k_rows",
                "value": round(ours_rate, 3),
                "unit": "family-scores/s (10-fold CV, 10k rows)",
                "vs_baseline": round(ours_rate / base_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
