"""Batch-vs-serial RCoT conditioning-solve parity on a SHARED feature draw.

The serial path solves the (num_z × num_z) conditioning system with a host
f64 LU (+1e-10 jitter); the fused batch path uses an f32 jittered Cholesky
(+1e-5 relative ridge). With the random Fourier draw held fixed, any
p-value gap is exactly the estimator discrepancy between the two solves —
this pins that gap (round-4 advisor finding: only decision-level tests
covered the batch path)."""

import numpy as np
import pytest

from pybnesian_tpu.learning.independences.rcot import (
    _get_batched,
    _pvalue_from_eigs,
    _rff_kernel,
    _test_with_z_core,
    rf_sigma,
)


def _shared_draw_pvalues(x, y, z, seed):
    import jax.numpy as jnp

    n = len(x)
    rng = np.random.default_rng(seed)
    num_xy, num_z = 5, 100
    Wx = rng.standard_normal((1, num_xy)) / rf_sigma(x)
    bx = rng.uniform(0, 2 * np.pi, num_xy)
    Wy = rng.standard_normal((1, num_xy)) / rf_sigma(y)
    by = rng.uniform(0, 2 * np.pi, num_xy)
    Wz = rng.standard_normal((z.shape[1], num_z)) / rf_sigma(z)
    bz = rng.uniform(0, 2 * np.pi, num_z)

    # serial route: f32 features -> host f64 LU (+1e-10)
    rff = _rff_kernel()
    fx = rff(jnp.asarray(x[:, None], jnp.float32), jnp.asarray(Wx, jnp.float32),
             jnp.asarray(bx, jnp.float32))
    fy = rff(jnp.asarray(y[:, None], jnp.float32), jnp.asarray(Wy, jnp.float32),
             jnp.asarray(by, jnp.float32))
    fz = rff(jnp.asarray(z, jnp.float32), jnp.asarray(Wz, jnp.float32),
             jnp.asarray(bz, jnp.float32))
    sta_s, eigs_s = _test_with_z_core(fx, fy, fz)
    p_serial = _pvalue_from_eigs(np.asarray(eigs_s, np.float64), sta_s)

    # fused batch route (B=1): same W/b -> f32 Cholesky (+1e-5 ridge)
    fused_z, _ = _get_batched()
    data = jnp.asarray(
        np.column_stack([x, y, z]).astype(np.float32)
    )
    zc = jnp.asarray(np.arange(2, 2 + z.shape[1], dtype=np.int32)[None, :])
    sta_b, eigs_b = fused_z(
        data,
        jnp.asarray([0], jnp.int32),
        jnp.asarray(Wx[None, 0].astype(np.float32)),
        jnp.asarray(bx[None, :].astype(np.float32)),
        jnp.asarray([1], jnp.int32),
        jnp.asarray(Wy[None, 0].astype(np.float32)),
        jnp.asarray(by[None, :].astype(np.float32)),
        zc,
        jnp.ones((1, z.shape[1]), jnp.float32),
        jnp.asarray(Wz[None, :, :].astype(np.float32)),
        jnp.asarray(bz[None, :].astype(np.float32)),
    )
    p_batch = _pvalue_from_eigs(
        np.asarray(eigs_b, np.float64)[0], float(sta_b[0])
    )
    return p_serial, p_batch


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rcot_solve_gap_is_small_on_shared_draw(seed):
    rng = np.random.default_rng(10 + seed)
    n = 1500
    z = rng.normal(0, 1, (n, 2))
    # conditionally independent given z: mid-range p-values, where a solve
    # discrepancy would actually move the number
    x = z @ np.array([0.8, -0.4]) + rng.normal(0, 0.6, n)
    y = z @ np.array([-0.5, 0.7]) + rng.normal(0, 0.6, n)
    p_serial, p_batch = _shared_draw_pvalues(x, y, z, seed)
    assert abs(p_serial - p_batch) < 0.02, (p_serial, p_batch)


def test_rcot_solve_gap_dependent_case():
    rng = np.random.default_rng(5)
    n = 1500
    z = rng.normal(0, 1, (n, 2))
    x = z @ np.array([0.8, -0.4]) + rng.normal(0, 0.6, n)
    y = 0.6 * x + z @ np.array([-0.5, 0.7]) + rng.normal(0, 0.6, n)
    p_serial, p_batch = _shared_draw_pvalues(x, y, z, 3)
    assert p_serial < 1e-4 and p_batch < 1e-4, (p_serial, p_batch)
