"""Interpret-mode parity of the flash CV-CKDE path vs the XLA fused kernel.

The flash path (ops/kde.py ckde_cv_alldevice_flash) splits the fused kernel
into an XLA whitening stage and a Pallas streaming double-logsumexp; both
must agree with ckde_cv_alldevice exactly (same fold/bandwidth math).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pybnesian_tpu.ops.kde import ckde_cv_alldevice, ckde_cv_alldevice_flash


def _setup(F=4, n=512, D=4, K=3, djmax=2, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(0, 1.5, (n, D)).astype(np.float32)
    for j in range(1, D):
        data[:, j] += 0.7 * data[:, j - 1]
    null = np.zeros((n, D), np.float32)
    null[rng.random((n, D)) < 0.05] = 1.0
    data = np.where(null > 0, 0.0, data)

    col_idx = np.zeros((F, djmax), np.int32)
    col_mask = np.zeros((F, djmax), np.float32)
    # families: evidence first, variable last
    col_idx[0, 0] = 0
    col_mask[0, 0] = 1.0  # univariate
    for f in range(1, F):
        col_idx[f, 0] = (f + 1) % D
        col_idx[f, 1] = f % D
        col_mask[f, :2] = 1.0

    idx = rng.permutation(n)
    folds = np.array_split(idx, K)
    ntr = 256 * ((n - min(len(f) for f in folds)) // 256 + 1)
    nte = 256 * ((max(len(f) for f in folds) + 255) // 256)
    tr_idx = np.zeros((K, ntr), np.int32)
    tr_mask = np.zeros((K, ntr), np.float32)
    te_idx = np.zeros((K, nte), np.int32)
    te_mask = np.zeros((K, nte), np.float32)
    for k in range(K):
        te = folds[k]
        tr = np.concatenate([folds[j] for j in range(K) if j != k])
        tr_idx[k, : len(tr)] = tr
        tr_mask[k, : len(tr)] = 1.0
        te_idx[k, : len(te)] = te
        te_mask[k, : len(te)] = 1.0
    return (jnp.asarray(data), jnp.asarray(null), jnp.asarray(col_idx),
            jnp.asarray(col_mask), jnp.asarray(tr_idx), jnp.asarray(tr_mask),
            jnp.asarray(te_idx), jnp.asarray(te_mask))


@pytest.mark.parametrize("rule", ["nr", "scott"])
def test_flash_matches_xla_fused(rule):
    args = _setup()
    ref = np.asarray(ckde_cv_alldevice(*args, chunk=256, rule=rule))
    out = np.asarray(
        ckde_cv_alldevice_flash(*args, rule=rule, block_m=128, block_n=256,
                                interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-3)


def test_flash_wider_family(seed=1):
    args = _setup(F=2, D=4, djmax=4, seed=1)
    ref = np.asarray(ckde_cv_alldevice(*args, chunk=256, rule="nr"))
    out = np.asarray(
        ckde_cv_alldevice_flash(*args, rule="nr", block_m=128, block_n=256,
                                interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-3)


def test_flash_selfcheck_interpret():
    """The one-time parity gate used by the scoring path and bench.py
    (flash_cv_selfcheck) passes in interpret mode on CPU."""
    from pybnesian_tpu.ops.kde import flash_cv_selfcheck

    ok, diff = flash_cv_selfcheck(interpret=True)
    assert ok, f"selfcheck diff {diff}"
    assert diff < 5e-2


def test_flash_fallback_state_gates_by_backend(monkeypatch):
    """On a non-TPU backend the scoring path never consults the flash gate
    (uses the XLA kernel) and the verified-state flag stays untouched."""
    import pybnesian_tpu.learning.scores.likelihood as lik

    monkeypatch.setattr(lik, "_FLASH_CV_STATE", None)
    args = _setup()
    out = np.asarray(lik._fused_cv_scores(*args, chunk=256, rule="nr"))
    ref = np.asarray(ckde_cv_alldevice(*args, chunk=256, rule="nr"))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert lik._FLASH_CV_STATE is None  # gate not consulted off-TPU
