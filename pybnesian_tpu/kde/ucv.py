"""UCV (unbiased cross-validation) bandwidth selection.

Rebuild of reference kde/UCV.{hpp,cpp} (~580 LoC): the leave-one-out UCV
objective evaluated on device over the N(N−1)/2 pair triangle, minimized with
Nelder–Mead over vech(chol(H)) (full) or sqrt-diagonal (diagonal) — the
reference uses NLopt LN_NELDERMEAD (UCV.cpp:469, 505); here scipy's
Nelder–Mead with matching relative tolerances. The same guard rails are kept:
determinant bounded within 1e±3 of the normal-reference start, scores bounded
within 1e3 of the start score (UCV.cpp:400-460).
"""

from __future__ import annotations

import math

import numpy as np

from ..data import DataFrame
from ..utils import MACHINE_TOL
from .bandwidth import BandwidthSelector, NormalReferenceRule

__all__ = ["UCV", "UCVScorer", "vech", "invvech_triangular"]

_LOG_2PI = math.log(2 * math.pi)


def vech(m: np.ndarray) -> np.ndarray:
    """Half-vectorization: stack the lower triangle column by column
    (reference util/vech_ops.cpp)."""
    d = m.shape[0]
    return np.concatenate([m[j:, j] for j in range(d)])


def invvech_triangular(v: np.ndarray) -> np.ndarray:
    """Inverse of vech producing a lower-triangular matrix."""
    d = int((math.sqrt(8 * len(v) + 1) - 1) / 2)
    out = np.zeros((d, d))
    pos = 0
    for j in range(d):
        out[j:, j] = v[pos: pos + d - j]
        pos += d - j
    return out


def _vech_indices(d: int):
    """(rows, cols) scattering a vech vector back into the lower triangle
    in vech's COLUMN-major order (column by column) — NOT np.tril_indices,
    whose row-major order would permute entries for d >= 3."""
    rows = np.concatenate([np.arange(j, d) for j in range(d)])
    cols = np.concatenate([np.full(d - j, j) for j in range(d)])
    return rows, cols


class UCVScorer:
    """(reference kde/UCV.hpp:12-47)."""

    def __init__(self, df, variables):
        df = DataFrame.wrap(df)
        self.variables = list(variables)
        self.training = df.to_numpy(self.variables, drop_null=True,
                                    dtype=np.float64)
        self.N = len(self.training)
        self.d = len(self.variables)
        self._chunk = 512
        npad = max(self._chunk, -(-self.N // self._chunk) * self._chunk)
        self._npad = npad
        self._valid = np.zeros(npad)
        self._valid[: self.N] = 1.0

    def _pair_sums(self, chol: np.ndarray):
        import jax.numpy as jnp
        from scipy.linalg import solve_triangular

        from ..ops.kde import ucv_pair_sums

        white = solve_triangular(chol, self.training.T, lower=True).T
        padded = np.zeros((self._npad, self.d))
        padded[: self.N] = white
        s2h, sh = ucv_pair_sums(
            jnp.asarray(padded), jnp.asarray(self._valid), chunk=self._chunk
        )
        return float(s2h), float(sh)

    def score_unconstrained(self, bandwidth: np.ndarray) -> float:
        """N-scaled UCV score (reference UCV.cpp:297-358)."""
        bandwidth = np.asarray(bandwidth, dtype=np.float64)
        try:
            chol = np.linalg.cholesky(bandwidth)
        except np.linalg.LinAlgError:
            return math.inf
        lognorm_h = (
            -np.sum(np.log(np.diag(chol))) - 0.5 * self.d * _LOG_2PI
        )
        lognorm_2h = lognorm_h - 0.5 * self.d * math.log(2.0)
        s2h_raw, sh_raw = self._pair_sums(chol)
        s2h = s2h_raw * math.exp(lognorm_2h)
        sh = sh_raw * math.exp(lognorm_h)
        return (
            math.exp(lognorm_2h) + 2.0 * s2h / self.N - 4.0 * sh / (self.N - 1)
        )

    def score_diagonal(self, diag_bandwidth: np.ndarray) -> float:
        return self.score_unconstrained(np.diag(np.asarray(diag_bandwidth)))


def _device_minimize(scorer: UCVScorer, x0, start_det, start_score,
                     diagonal: bool):
    """Run the whole Nelder–Mead UCV minimization in ONE device dispatch
    (objective evaluations included) — the reference launches one OpenCL
    pair-sum pipeline per NLopt evaluation (kde/UCV.cpp:469-505); a remote
    dispatch per evaluation would dominate the optimization here."""
    import jax
    import jax.numpy as jnp

    from ..ops.kde import ucv_pair_sums
    from ..ops.nelder_mead import nelder_mead

    d = scorer.d
    N = scorer.N
    chunk = scorer._chunk
    pad = np.zeros((scorer._npad, d))
    pad[:N] = scorer.training
    Xpad = jnp.asarray(pad)
    valid = jnp.asarray(scorer._valid)
    rows, cols = _vech_indices(d)
    log2 = math.log(2.0)
    max_iter = 200 * len(x0)

    @jax.jit
    def run(x0_, sd, ss, fat, xat):
        def score_of_sqrt(L):
            logdiag = jnp.log(jnp.abs(jnp.diag(L)) + 1e-300)
            det = jnp.exp(2.0 * jnp.sum(logdiag))
            W = jax.scipy.linalg.solve_triangular(L, Xpad.T, lower=True).T
            s2h, sh = ucv_pair_sums(W, valid, chunk=chunk)
            lognorm_h = -jnp.sum(logdiag) - 0.5 * d * _LOG_2PI
            lognorm_2h = lognorm_h - 0.5 * d * log2
            score = (
                jnp.exp(lognorm_2h)
                + 2.0 * s2h * jnp.exp(lognorm_2h) / N
                - 4.0 * sh * jnp.exp(lognorm_h) / (N - 1)
            )
            bad = (
                (det <= MACHINE_TOL)
                | (det < 1e-3 * sd)
                | (det > 1e3 * sd)
                | jnp.isnan(det)
                | jnp.isnan(score)
                | (jnp.abs(score) > 1e3 * jnp.abs(ss))
            )
            return jnp.where(bad, ss + 1e-7, score)

        if diagonal:
            def objective(x):
                return score_of_sqrt(jnp.diag(x))
        else:
            def objective(x):
                L = jnp.zeros((d, d), x0_.dtype).at[rows, cols].set(x)
                return score_of_sqrt(L)

        return nelder_mead(objective, x0_, fat, xat, max_iter=max_iter)

    fatol = 1e-4 * abs(start_score) + 1e-12
    xatol = 1e-4 * float(np.abs(x0).max()) + 1e-12
    xb, fb, _ = run(jnp.asarray(x0), start_det, start_score, fatol, xatol)
    xb = np.asarray(xb, dtype=np.float64)
    # never return a worse point than the start (guard against f32 plateaus)
    return xb if float(fb) <= start_score else np.asarray(x0, np.float64)


def ucv_minimize_batch(Xpad, valid, Ns, x0s, d: int, chunk: int = 512):
    """Batched UCV bandwidth selection: B independent problems — each a
    padded (npad, d) training block with its own validity mask, row count
    and vech(chol(H_start)) start — minimized by a vmapped device
    Nelder–Mead in ONE dispatch. This is the structure-search form of
    :func:`_device_minimize`: a CV score over F families × K folds has F·K
    bandwidth problems, and running them as one batch replaces F·K
    sequential dispatch-bound optimizations (reference kde/UCV.cpp:469-505
    runs one NLopt loop per factor fit).

    Returns the host-f64 ``(B, nv)`` optimal vech factors; problems whose
    optimization did not improve on the start keep their start point.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.kde import ucv_pair_sums
    from ..ops.nelder_mead import nelder_mead_batch

    rows, cols = _vech_indices(d)
    nv = x0s.shape[1]
    log2 = math.log(2.0)
    max_iter = 200 * nv

    @jax.jit
    def run_all(Xd, Vd, Nd, X0):
        def raw_one(x, X, v, n):
            L = jnp.zeros((d, d), x.dtype).at[rows, cols].set(x)
            logdiag = jnp.log(jnp.abs(jnp.diag(L)) + 1e-300)
            det = jnp.exp(2.0 * jnp.sum(logdiag))
            W = jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T
            s2h, sh = ucv_pair_sums(W, v, chunk=chunk)
            lognorm_h = -jnp.sum(logdiag) - 0.5 * d * _LOG_2PI
            lognorm_2h = lognorm_h - 0.5 * d * log2
            score = (
                jnp.exp(lognorm_2h)
                + 2.0 * s2h * jnp.exp(lognorm_2h) / n
                - 4.0 * sh * jnp.exp(lognorm_h) / (n - 1.0)
            )
            return score, det

        raw_batch = jax.vmap(raw_one)
        ss, sd = raw_batch(X0, Xd, Vd, Nd)

        def objective(xs):  # (B, nv) -> (B,)
            score, det = raw_batch(xs, Xd, Vd, Nd)
            bad = (
                (det <= MACHINE_TOL)
                | (det < 1e-3 * sd)
                | (det > 1e3 * sd)
                | jnp.isnan(det)
                | jnp.isnan(score)
                | (jnp.abs(score) > 1e3 * jnp.abs(ss))
            )
            return jnp.where(bad, ss + 1e-7, score)

        fatol = 1e-4 * jnp.abs(ss) + 1e-12
        xatol = 1e-4 * jnp.max(jnp.abs(X0), axis=1) + 1e-12
        xb, fb, _ = nelder_mead_batch(objective, X0, fatol, xatol,
                                      max_iter=max_iter)
        return xb, fb, ss

    xb, fb, ss = run_all(
        jnp.asarray(Xpad), jnp.asarray(valid), jnp.asarray(Ns),
        jnp.asarray(x0s),
    )
    xb = np.array(xb, np.float64)  # copy: device arrays are read-only views
    worse = np.asarray(fb, np.float64) > np.asarray(ss, np.float64)
    xb[worse] = np.asarray(x0s, np.float64)[worse]
    return xb


class UCV(BandwidthSelector):
    def __init__(self):
        self._nr = NormalReferenceRule()

    def bandwidth(self, df, variables) -> np.ndarray:
        variables = list(variables)
        if not variables:
            return np.zeros((0, 0))
        start_h = self._nr.bandwidth(df, variables)
        scorer = UCVScorer(df, variables)
        start_score = scorer.score_unconstrained(start_h)
        start_det = float(np.linalg.det(start_h))
        x0 = vech(np.linalg.cholesky(start_h))
        xb = _device_minimize(scorer, x0, start_det, start_score,
                              diagonal=False)
        sqrt = invvech_triangular(xb)
        return sqrt @ sqrt.T

    def diag_bandwidth(self, df, variables) -> np.ndarray:
        variables = list(variables)
        if not variables:
            return np.zeros(0)
        start_diag = self._nr.diag_bandwidth(df, variables)
        scorer = UCVScorer(df, variables)
        start_score = scorer.score_diagonal(start_diag)
        start_det = float(np.prod(start_diag))
        x0 = np.sqrt(start_diag)
        xb = _device_minimize(scorer, x0, start_det, start_score,
                              diagonal=True)
        return np.square(xb)

    def ToString(self) -> str:
        return "UCV"
