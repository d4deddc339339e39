"""BASELINE config 4: PC-stable with partial correlation on a 50-node
Gaussian network, 100k rows — exercises the batched independence-test
kernels (learning/independences/linearcorrelation.py cached-covariance
algebra vs the reference's per-pair Eigen path, pc.cpp:222-263).

Metric: conditional-independence p-value evaluations per second inside a
full PC run, vs a serial scipy partial-correlation baseline.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

N_NODES = 50
N_ROWS = 100_000


def make_data(n=N_ROWS, d=N_NODES, seed=0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    cols = {}
    order = [f"v{i}" for i in range(d)]
    for i, name in enumerate(order):
        base = rng.normal(0, 1, n)
        if i >= 1 and rng.random() < 0.6:
            base += 0.8 * cols[order[i - 1]]
        if i >= 2 and rng.random() < 0.3:
            base += 0.5 * cols[order[i - 2]]
        cols[name] = base
    return pd.DataFrame(cols)


class _CountingTest:
    def __init__(self, inner):
        self.inner = inner
        self.count = 0

    def pvalue(self, *a):
        self.count += 1
        return self.inner.pvalue(*a)

    def pvalue_batch(self, triples):
        triples = list(triples)
        self.count += len(triples)
        return self.inner.pvalue_batch(triples)

    def variable_names(self):
        return self.inner.variable_names()

    def num_variables(self):
        return self.inner.num_variables()

    def name(self, i):
        return self.inner.name(i)

    def has_variables(self, v):
        return self.inner.has_variables(v)


def bench_ours(df):
    from pybnesian_tpu import PC, LinearCorrelation

    test = _CountingTest(LinearCorrelation(df))
    t0 = time.time()
    pdag = PC().estimate(test, alpha=0.05)
    elapsed = time.time() - t0
    return test.count / elapsed, test.count, pdag.num_arcs() + pdag.num_edges()


def bench_baseline(df, n_tests=200):
    """Serial scipy: residualize then pearson, one pair at a time."""
    from scipy import stats

    mat = df.to_numpy()
    d = mat.shape[1]
    rng = np.random.default_rng(0)
    t0 = time.time()
    for _ in range(n_tests):
        i, j, k = rng.choice(d, 3, replace=False)
        zi = mat[:, [k]]
        ri = mat[:, i] - zi @ np.linalg.lstsq(zi, mat[:, i], rcond=None)[0]
        rj = mat[:, j] - zi @ np.linalg.lstsq(zi, mat[:, j], rcond=None)[0]
        stats.pearsonr(ri, rj)
    return n_tests / (time.time() - t0)


def bench_rcot(df, n_nodes=N_NODES):
    """RCoT PC on the FULL 50-node/100k-row network (BASELINE config 4):
    the batched pipeline runs each chunk of a PC order's surviving tests
    as ONE fused device launch. Warm-up calls first: the first dispatch of
    a process pays a highly variable one-time tunnel/compile cost (0.1s to
    10+ min measured) that would otherwise dominate the measurement —
    the timed run is steady-state throughput, as in bench_ours/config2."""
    from pybnesian_tpu import PC, RCoT

    sub = df[df.columns[:n_nodes]]
    inner = RCoT(sub, seed=0)
    names = list(sub.columns)
    for z in ([], ["v2"], ["v2", "v3"], ["v2", "v3", "v4"],
              ["v2", "v3", "v4", "v5", "v6"]):
        inner.pvalue_batch([(names[0], names[1], tuple(z))])
    test = _CountingTest(inner)
    t0 = time.time()
    PC().estimate(test, alpha=0.05)
    return test.count / (time.time() - t0), test.count


def rcot_kernel_only_rate(df, B=32):
    """Device-kernel ceiling for the conditional RCoT batch: time ONE fused
    launch (feature maps → conditioning solve → eigvals) of B tests at the
    benchmark shape, with a forced fetch. End-to-end ÷ this = how much of
    the device rate the whole PC pipeline (sigma draws, p-value tail,
    batching logic) sustains."""
    import jax.numpy as jnp

    from pybnesian_tpu import RCoT
    from pybnesian_tpu.learning.independences.rcot import _get_batched

    inner = RCoT(df[df.columns[:8]], seed=0)
    data, pos = inner._device_data()
    fused_z, _ = _get_batched()
    rng = np.random.default_rng(0)
    f, fz = 5, 100
    dz = 2
    xc = jnp.asarray((np.arange(B) % 4).astype(np.int32))
    yc = jnp.asarray(((np.arange(B) + 1) % 4).astype(np.int32))
    zc = jnp.asarray(
        np.stack([(np.arange(B) + 2) % 8, (np.arange(B) + 3) % 8], 1)
        .astype(np.int32)
    )
    zm = jnp.ones((B, dz), jnp.float32)
    mk = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(np.float32))
    args = (data, xc, mk(B, f), mk(B, f), yc, mk(B, f), mk(B, f), zc, zm,
            mk(B, dz, fz), mk(B, fz))
    np.asarray(fused_z(*args)[0])  # compile + warm
    best = np.inf
    for r in range(3):
        args = (data, xc, mk(B, f), mk(B, f), yc, mk(B, f), mk(B, f), zc,
                zm, mk(B, dz, fz), mk(B, fz))
        t0 = time.time()
        np.asarray(fused_z(*args)[0])
        best = min(best, time.time() - t0)
    return B / best


def main():
    df = make_data()
    rate, n_tests, n_links = bench_ours(df)
    base = bench_baseline(df)
    rcot_rate, rcot_tests = bench_rcot(df)
    try:
        kernel_rate = rcot_kernel_only_rate(df)
        rcot_fraction = round(rcot_rate / kernel_rate, 2)
    except Exception:
        kernel_rate = rcot_fraction = None
    print(json.dumps({
        "metric": "config4_pc_pvalues_per_s_50n_100k",
        "value": round(rate, 1),
        "unit": f"pvalues/s (PC-stable, {n_tests} tests, {n_links} links)",
        "vs_baseline": round(rate / base, 2),
        "rcot_pvalues_per_s_50n_100k": round(rcot_rate, 1),
        "rcot_tests": rcot_tests,
        "rcot_kernel_only_pvalues_per_s": round(kernel_rate, 1) if kernel_rate else None,
        "roofline_fraction": rcot_fraction,
        "roofline_basis": "RCoT end-to-end pvalues/s vs one-launch fused-kernel rate at the same shape",
    }))


if __name__ == "__main__":
    main()
