"""Microbenchmark: TPU f32 exp/transcendental throughput vs the flash CV
kernel's pair rate.

The CV-CKDE hot kernel spends 2 exps per (test, train, fold) pair (joint +
marginal online logsumexp). If the measured pure-exp rate E (exps/s) matches
the kernel's 2×pairs/s, the kernel is AT the exp roofline and further
single-chip gains require algorithmic change, not scheduling
(docs/PERFORMANCE.md). Run on the real TPU: `python
benchmarks/micro_exp_roofline.py`.

Outputs one JSON line with exp/s for: bare exp, exp+sum (the logsumexp inner
shape), and the flash kernel's pairs/s and exps/s at bench shapes.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SHAPE = (2048, 8192)  # one VMEM-friendly tile's worth per iteration
ITERS = 64


@jax.jit
def bare_exp_sum(x):
    # jnp.exp then a cheap reduce so XLA cannot DCE the exp; the reduce adds
    # 1 VPU op per element next to exp's multi-op cost
    def body(c, _):
        c = c * 0.9999 + jnp.sum(jnp.exp(x + c * 1e-6))
        return c, None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
    return out


@jax.jit
def exp_logsumexp_shape(x):
    # the kernel's actual inner pattern: rowwise max, exp-shift, rowwise sum
    def body(c, _):
        xi = x + c * 1e-6
        m = jnp.max(xi, axis=1, keepdims=True)
        s = jnp.sum(jnp.exp(xi - m), axis=1)
        c = c * 0.9999 + jnp.sum(m[:, 0] + jnp.log(s))
        return c, None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
    return out


def timeit(fn, x, reps=3):
    np.asarray(fn(x))  # compile + warm
    best = np.inf
    for r in range(reps):
        xr = x + np.float32(r + 1) * 1e-7
        t0 = time.time()
        out = np.asarray(fn(xr))  # forced D2H fetch (axon timing trap)
        best = min(best, time.time() - t0)
    return best


def pallas_exp_chain_rate():
    """Hardware exp throughput: a Pallas kernel that keeps one VMEM tile
    resident and issues CHAIN dependent exps per element — no HBM traffic,
    no XLA elementwise-chain overhead. This is the truest available measure
    of the VPU transcendental rate."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHAIN = 64
    M, N = 512, 1024

    def kern(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for _ in range(CHAIN):
            acc = acc * 0.5 + jnp.exp(x - acc * 1e-3 - 1.0)
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(64,),
            in_specs=[pl.BlockSpec((M, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(-np.abs(rng.normal(size=(M, N))).astype(np.float32))
    np.asarray(run(x))
    best = np.inf
    for r in range(3):
        t0 = time.time()
        np.asarray(run(x + np.float32(r) * 1e-6))
        best = min(best, time.time() - t0)
    return M * N * CHAIN * 64 / best


def flash_pairs_rate():
    from pybnesian_tpu.ops.pallas_kde import pallas_ckde_cv_pairs

    # G large enough to amortize the ~25-40 ms dispatch round trip of this
    # environment's TPU tunnel — matches the bench launch (160 programs)
    G, ntr, nte, dpad = 160, 9216, 1024, 4
    rng = np.random.default_rng(0)
    jtr = jnp.asarray(rng.normal(size=(G, ntr, dpad)).astype(np.float32))
    neg = jnp.zeros((G, ntr), jnp.float32)
    zv_tr = jtr[:, :, -1]
    jte = jnp.asarray(rng.normal(size=(G, nte, dpad)).astype(np.float32))
    zv_te = jte[:, :, -1]
    np.asarray(pallas_ckde_cv_pairs(jtr, neg, zv_tr, jte, zv_te))
    best = np.inf
    for r in range(3):
        jtr2 = jtr + np.float32(r + 1) * 1e-6
        t0 = time.time()
        np.asarray(pallas_ckde_cv_pairs(jtr2, neg, zv_tr, jte, zv_te))
        best = min(best, time.time() - t0)
    return G * ntr * nte / best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        -np.abs(rng.normal(size=SHAPE)).astype(np.float32) * 5.0
    )
    n_elem = SHAPE[0] * SHAPE[1] * ITERS
    t_exp = timeit(bare_exp_sum, x)
    t_lse = timeit(exp_logsumexp_shape, x)
    hw_exp = pallas_exp_chain_rate()
    pairs = flash_pairs_rate()
    print(
        json.dumps(
            {
                "metric": "tpu_exp_throughput",
                "value": round(hw_exp / 1e9, 2),
                "unit": "Gexp/s (Pallas in-register exp chain, f32)",
                "vs_baseline": round((2 * pairs) / hw_exp, 3),
                "detail": {
                    "pallas_chain_gexp_s": round(hw_exp / 1e9, 2),
                    "xla_exp_sum_gexp_s": round(n_elem / t_exp / 1e9, 2),
                    "xla_logsumexp_gexp_s": round(n_elem / t_lse / 1e9, 2),
                    "flash_pairs_per_s_g": round(pairs / 1e9, 2),
                    "flash_exps_per_s_g_upper": round(2 * pairs / 1e9, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
