"""CKDE: conditional kernel density estimation factor.

Rebuild of reference factors/continuous/CKDE.{hpp,cpp} (992 LoC):
``logl = logl_joint − logl_marg`` where the joint KDE covers
(variable, evidence) and the marginal KDE shares the joint's training block
and bandwidth sub-matrix (CKDE.hpp:182-254). Sampling draws a training kernel
per row with probability ∝ marginal kernel weight at the evidence — here via
a device Gumbel-max instead of the reference's prefix-sum inverse-CDF kernels
(CKDE.hpp:289-470) — then samples the conditional Gaussian of that kernel.
"""

from __future__ import annotations

import math

import numpy as np

from ..data import DataFrame
from ..kde.bandwidth import BandwidthSelector, NormalReferenceRule
from ..kde.kde import KDE, _CHUNK, _next_pow2
from .base import Factor, FactorType

__all__ = ["CKDEType", "CKDE"]

_LOG_2PI = math.log(2 * math.pi)


class CKDEType(FactorType):
    def new_factor(self, model, variable, evidence, *args, **kwargs):
        """Dispatch to HCKDE when any evidence node is discrete
        (reference CKDE.cpp:15-33)."""
        if model is not None:
            from .discrete import DiscreteFactorType

            for e in evidence:
                if model.node_type(e) == DiscreteFactorType():
                    from .hybrid import HCKDE

                    return HCKDE(variable, evidence, *args, **kwargs)
        return CKDE(variable, evidence, *args, **kwargs)

    def ToString(self) -> str:
        return "CKDEFactor"


def batched_ckde_logl_many(entries, chunk: int = 256):
    """Per-row logl of many fitted CKDE factors in ONE device launch.

    entries: list of ``(ckde, test_mat)`` where ``test_mat`` is an (m_i, dj)
    float64 matrix in the factor's ``[variable, *evidence]`` column order
    with nulls already zeroed (the caller handles NaN scatter). Returns a
    list of (m_i,) float64 arrays.

    Uses the shared-Cholesky layout: columns are permuted evidence-first so
    the joint Cholesky's leading block is the marginal's (the reference's
    device-buffer sharing, CKDE.hpp:182-200), letting
    :func:`pybnesian_tpu.ops.kde.batched_ckde_logl` compute both
    log-densities from one distance matmul.
    """
    import jax.numpy as jnp
    from scipy.linalg import solve_triangular

    from ..ops.kde import batched_ckde_logl

    F = len(entries)
    ntr_pad = -(-max(e[0].num_instances() for e in entries) // 256) * 256
    m_pad = -(-max(max(len(e[1]) for e in entries), 1) // chunk) * chunk
    djmax = max(1 + len(e[0].evidence()) for e in entries)
    jtr = np.zeros((F, ntr_pad, djmax))
    jte = np.zeros((F, m_pad, djmax))
    trm = np.zeros((F, ntr_pad))
    zv_tr = np.zeros((F, ntr_pad))
    zv_te = np.zeros((F, m_pad))
    lndiff = np.zeros(F)
    for f, (cpd, mat) in enumerate(entries):
        joint = cpd.kde_joint()
        dj = 1 + len(cpd.evidence())
        n_i = joint.num_instances()
        perm = list(range(1, dj)) + [0]  # fitted layout is [var, *ev]
        Hp = joint.bandwidth[np.ix_(perm, perm)]
        Lp = np.linalg.cholesky(Hp)
        jtr[f, :n_i, :dj] = solve_triangular(
            Lp, joint._training[:, perm].T, lower=True
        ).T
        trm[f, :n_i] = 1.0
        lndiff[f] = -math.log(Lp[dj - 1, dj - 1]) - 0.5 * _LOG_2PI
        jte[f, : len(mat), :dj] = solve_triangular(
            Lp, mat[:, perm].T, lower=True
        ).T
        zv_tr[f] = jtr[f, :, dj - 1]
        zv_te[f] = jte[f, :, dj - 1]
    out = np.asarray(
        batched_ckde_logl(
            jnp.asarray(jtr), jnp.asarray(jte), jnp.asarray(zv_tr),
            jnp.asarray(zv_te), jnp.asarray(trm), jnp.asarray(lndiff),
            chunk=chunk,
        ),
        dtype=np.float64,
    )
    return [out[f, : len(entries[f][1])] for f in range(F)]


class CKDE(Factor):
    def __init__(self, variable, evidence=(), bandwidth_selector: BandwidthSelector | None = None):
        super().__init__(variable, evidence)
        self._bselector = bandwidth_selector or NormalReferenceRule()
        self._joint: KDE | None = None
        self._marg: KDE | None = None
        self._fitted = False

    def type(self) -> FactorType:
        return CKDEType()

    def fitted(self) -> bool:
        return self._fitted

    def data_type(self):
        if not self._fitted:
            raise ValueError("CKDE factor not fitted.")
        return self._joint.data_type()

    def kde_joint(self) -> KDE:
        self._check_fitted()
        return self._joint

    def kde_marg(self) -> KDE:
        self._check_fitted()
        return self._marg

    def num_instances(self) -> int:
        self._check_fitted()
        return self._joint.num_instances()

    def bandwidth_selector(self) -> BandwidthSelector:
        return self._bselector

    def _check_fitted(self):
        if not self._fitted:
            raise ValueError(
                f"Factor P({self._variable} | {self._evidence}) not fitted."
            )

    # ------------------------------------------------------------------ fit
    def fit(self, df) -> None:
        df = DataFrame.wrap(df)
        variables = [self._variable, *self._evidence]
        self._joint = KDE(variables, self._bselector)
        self._joint.fit(df)
        if self._evidence:
            # marginal shares the joint's training block and bandwidth
            # sub-matrix (reference CKDE.hpp:182-200)
            self._marg = KDE(list(self._evidence), self._bselector)
            self._marg._dtype = self._joint._dtype
            self._marg.fit_with_bandwidth(
                self._joint._training[:, 1:], self._joint.bandwidth[1:, 1:]
            )
        else:
            self._marg = None
        self._fitted = True

    # ----------------------------------------------------------------- logl
    def logl(self, df) -> np.ndarray:
        self._check_fitted()
        df = DataFrame.wrap(df)
        if not self._evidence:
            return self._joint.logl(df)
        from ..ops.kde import kde_conditional_logsumexp
        import jax.numpy as jnp

        variables = [self._variable, *self._evidence]
        self._joint._check_test_dtype(df)
        mat = df.to_numpy(variables, drop_null=False, dtype=np.float64)
        valid = df.combined_mask(*variables)
        dtype = np.float64
        joint_test = self._joint._whiten(np.nan_to_num(mat, nan=0.0))
        marg_test = self._marg._whiten(np.nan_to_num(mat[:, 1:], nan=0.0))
        m = len(mat)
        m_pad = _next_pow2(m, _CHUNK)
        if m_pad != m:
            joint_test = np.vstack(
                [joint_test, np.zeros((m_pad - m, joint_test.shape[1]), dtype)]
            )
            marg_test = np.vstack(
                [marg_test, np.zeros((m_pad - m, marg_test.shape[1]), dtype)]
            )
        out = np.array(
            kde_conditional_logsumexp(
                self._joint.whitened_training(),
                jnp.asarray(joint_test),
                self._marg.whitened_training(),
                jnp.asarray(marg_test),
                np.asarray(self._joint._lognorm, dtype=dtype),
                np.asarray(self._marg._lognorm, dtype=dtype),
                chunk=_CHUNK,
            ),
            dtype=np.float64,
        )[:m]
        out[~valid] = np.nan
        return out

    def slogl(self, df) -> float:
        return float(np.nansum(self.logl(df)))

    # ------------------------------------------------------------ cond gauss
    def _conditional_coefs(self):
        """Regression of variable on evidence within one kernel:
        mean_i(e) = x_i0 + Hve·Hee⁻¹·(e − x_i,1:), var = Hvv − Hve·Hee⁻¹·Hev."""
        H = self._joint.bandwidth
        Hvv = H[0, 0]
        Hve = H[0, 1:]
        Hee = H[1:, 1:]
        reg = np.linalg.solve(Hee, Hve)
        cond_var = float(Hvv - Hve @ reg)
        return reg, cond_var

    def _kernel_weights_logits(self, evidence_mat: np.ndarray) -> np.ndarray:
        """(M, N) marginal log-kernel weights at the evidence rows."""
        from ..ops.kde import kde_logl_pair
        import jax.numpy as jnp

        dtype = np.float64
        test = self._marg._whiten(evidence_mat)
        m = len(test)
        m_pad = _next_pow2(m, _CHUNK)
        if m_pad != m:
            test = np.vstack([test, np.zeros((m_pad - m, test.shape[1]), dtype)])
        logits = np.asarray(
            kde_logl_pair(
                self._marg.whitened_training(),
                jnp.asarray(test),
                np.asarray(0.0, dtype=dtype),
                chunk=_CHUNK,
            ),
            dtype=np.float64,
        )[:m]
        return logits

    # --------------------------------------------------------------- sample
    def sample(self, n: int, evidence_values=None, seed: int | None = None):
        self._check_fitted()
        rng = np.random.default_rng(seed)
        train = self._joint._training
        if not self._evidence:
            idx = rng.integers(0, len(train), n)
            h = math.sqrt(self._joint.bandwidth[0, 0])
            return self._as_pa(train[idx, 0] + rng.normal(0.0, h, n))
        ev = DataFrame.wrap(evidence_values)
        mat = ev.to_numpy(self._evidence, drop_null=False, dtype=np.float64)
        if len(mat) != n:
            raise ValueError("evidence_values rows != n")
        logits = self._kernel_weights_logits(np.nan_to_num(mat, nan=0.0))
        # Gumbel-max categorical per row (device-friendly; equivalent in law
        # to the reference's inverse-CDF selection)
        g = rng.gumbel(size=logits.shape)
        idx = np.argmax(logits + g, axis=1)
        reg, cond_var = self._conditional_coefs()
        mean = train[idx, 0] + (mat - train[idx, 1:]) @ reg
        return self._as_pa(mean + rng.normal(0.0, math.sqrt(cond_var), n))

    def _as_pa(self, values: np.ndarray):
        """Samples are Arrow arrays in the training dtype (reference
        CKDE.hpp:289-384 returns arrow arrays)."""
        from ..data.arrow_interop import pa

        return pa.array(values.astype(self._joint._dtype))

    # ------------------------------------------------------------------ cdf
    def cdf(self, df) -> np.ndarray:
        """Σ_i w_i(e) Φ((x − μ_i(e)) / σ) (reference CKDE.hpp:164-168)."""
        self._check_fitted()
        from scipy.special import log_ndtr, logsumexp

        df = DataFrame.wrap(df)
        variables = [self._variable, *self._evidence]
        mat = df.to_numpy(variables, drop_null=False, dtype=np.float64)
        valid = df.combined_mask(*variables)
        train = self._joint._training
        x = mat[:, 0]
        if self._evidence:
            emat = np.nan_to_num(mat[:, 1:], nan=0.0)
            logits = self._kernel_weights_logits(emat)
            logw = logits - logsumexp(logits, axis=1, keepdims=True)
            reg, cond_var = self._conditional_coefs()
            mean = train[None, :, 0] + np.einsum(
                "me,e->m", emat, reg
            )[:, None] - (train[None, :, 1:] @ reg)
            # mean_ij = x_i0 + (e_j - x_i,1:)·reg  → shape (M, N)
            sd = math.sqrt(cond_var)
            z = (x[:, None] - mean) / sd
            out = np.exp(logsumexp(logw + log_ndtr(z), axis=1))
        else:
            h = math.sqrt(self._joint.bandwidth[0, 0])
            z = (x[:, None] - train[None, :, 0]) / h
            out = np.exp(
                logsumexp(log_ndtr(z), axis=1) - math.log(len(train))
            )
        out[~valid] = np.nan
        return out

    # ---------------------------------------------------------------- string
    def ToString(self) -> str:
        v = self._variable
        if self._evidence:
            ev = ", ".join(self._evidence)
            suffix = "" if self._fitted else " not fitted"
            return f"[CKDE] P({v} | {ev}) = CKDE{suffix}"
        suffix = "" if self._fitted else " not fitted"
        return f"[CKDE] P({v}) = CKDE{suffix}"

    # --------------------------------------------------------------- pickle
    def __getstate__(self):
        return {
            "variable": self._variable,
            "evidence": self._evidence,
            "bselector": self._bselector,
            "fitted": self._fitted,
            "joint": self._joint,
            "marg": self._marg,
        }

    def __setstate__(self, state):
        Factor.__init__(self, state["variable"], state["evidence"])
        self._bselector = state["bselector"]
        self._fitted = state["fitted"]
        self._joint = state["joint"]
        self._marg = state["marg"]
