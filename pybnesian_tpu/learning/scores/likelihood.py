"""Likelihood-based scores: CVLikelihood, HoldoutLikelihood,
ValidatedLikelihood.

Rebuild of reference learning/scores/cv_likelihood.{hpp,cpp},
holdout_likelihood.{hpp,cpp}, validated_likelihood.hpp:12-80.

This is the hot path for KDE-network structure learning (SURVEY.md §3.1) and
the BASELINE north-star metric. TPU-first restructuring: instead of the
reference's serial per-(family, fold) factor fit+slogl, the linear-Gaussian
path evaluates all families × folds in one vmapped kernel
(:func:`pybnesian_tpu.ops.gaussian.batched_lg_cv_loglik`) and the CKDE path
batches all folds of a family into one pairwise-logsumexp launch
(:func:`pybnesian_tpu.ops.kde.ckde_cv_slogl`). Python-defined factor types
fall back to the generic fit/slogl loop, preserving the extension contract.
"""

from __future__ import annotations

import math

import numpy as np

from ...data import CrossValidation, DataFrame, HoldOut
from ...factors.base import Arguments
from ...factors.discrete import DiscreteFactorType
from ...factors.lineargaussian import LinearGaussianCPDType
from ...utils.exceptions import SingularCovarianceData
from .base import Score, ValidatedScore

__all__ = ["CVLikelihood", "HoldoutLikelihood", "ValidatedLikelihood"]


def _next_pow2(x: int, floor: int = 1) -> int:
    n = max(floor, 1)
    while n < x:
        n *= 2
    return n


def _ckde_selector(node_type, model, variable, parents, args):
    """Instantiate the factor once to honour Arguments-configured bandwidth
    selectors (factors/arguments.hpp routing)."""
    a, kw = args.args(variable, node_type)
    factor = node_type.new_factor(model, variable, list(parents), *a, **kw)
    return factor.bandwidth_selector()


class _KFoldEngine:
    """Shared device-path CV evaluation over a fixed fold split."""

    def __init__(self, df: DataFrame, folds: list[tuple[np.ndarray, np.ndarray]]):
        self.df = df
        self.folds = folds

    # ------------------------------------------------------------------ LG
    def lg_batch(self, families) -> np.ndarray:
        """families: list of (var_pos, [parent_pos]). One device call."""
        import jax.numpy as jnp

        from ...ops.gaussian import batched_lg_cv_loglik

        cols = self.df.continuous_columns()
        values, valid = self.df.device_matrix(cols)
        n = self.df.num_rows
        K = len(self.folds)
        if not hasattr(self, "_masks"):
            train = np.zeros((K, n), np.float64)
            test = np.zeros((K, n), np.float64)
            for k, (tr, te) in enumerate(self.folds):
                train[k, tr] = 1.0
                test[k, te] = 1.0
            self._masks = (
                jnp.asarray(train.astype(np.asarray(values).dtype)),
                jnp.asarray(test.astype(np.asarray(values).dtype)),
            )
        train_mask, test_mask = self._masks
        F = len(families)
        Fb = _next_pow2(F, 8)
        P = max((len(ps) for _, ps in families), default=0)
        Pb = _next_pow2(max(P, 1))
        var_idx = np.zeros(Fb, np.int32)
        parent_idx = np.zeros((Fb, Pb), np.int32)
        parent_mask = np.zeros((Fb, Pb), np.asarray(values).dtype)
        for f, (vi, ps) in enumerate(families):
            var_idx[f] = vi
            for j, p in enumerate(ps):
                parent_idx[f, j] = p
                parent_mask[f, j] = 1.0
        out = batched_lg_cv_loglik(
            values,
            valid,
            train_mask,
            test_mask,
            jnp.asarray(var_idx),
            jnp.asarray(parent_idx),
            jnp.asarray(parent_mask),
        )
        return np.asarray(out, dtype=np.float64)[:F]

    # ---------------------------------------------------------------- CKDE
    def ckde_score(self, variable, parents, selector) -> float:
        """All folds of one CKDE family in one device launch."""
        import jax.numpy as jnp
        from scipy.linalg import solve_triangular

        from ...ops.kde import ckde_cv_slogl, kde_cv_slogl

        cols = [variable, *parents]
        mat = self.df.to_numpy(cols, drop_null=False, dtype=np.float64)
        valid = self.df.combined_mask(*cols)
        dj = len(cols)
        chunk = 256
        K = len(self.folds)
        fold_data = []
        for (tr, te) in self.folds:
            tr = tr[valid[tr]]
            te = te[valid[te]]
            fold_data.append((tr, te))
        ntr = max((len(tr) for tr, _ in fold_data), default=0)
        nte_raw = max((len(te) for _, te in fold_data), default=0)
        nte = _next_pow2(nte_raw, chunk)
        ntr = _next_pow2(max(ntr, 1))
        jtr = np.zeros((K, ntr, dj))
        jte = np.zeros((K, nte, dj))
        mtr = np.zeros((K, ntr, max(dj - 1, 1)))
        mte = np.zeros((K, nte, max(dj - 1, 1)))
        trm = np.zeros((K, ntr))
        tem = np.zeros((K, nte))
        jln = np.zeros(K)
        mln = np.zeros(K)
        for k, (tr, te) in enumerate(fold_data):
            train = mat[tr]
            test = mat[te]
            ntr_k = len(train)
            if ntr_k <= dj:
                return -math.inf
            sub = self.df.take(tr)
            try:
                H = np.asarray(selector.bandwidth(sub, cols), dtype=np.float64)
                L = np.linalg.cholesky(H)
            except (SingularCovarianceData, np.linalg.LinAlgError):
                return -math.inf
            jtr[k, :ntr_k] = solve_triangular(L, train.T, lower=True).T
            jte[k, : len(test)] = solve_triangular(L, test.T, lower=True).T
            trm[k, :ntr_k] = 1.0
            tem[k, : len(te)] = 1.0
            jln[k] = (
                -np.sum(np.log(np.diag(L)))
                - 0.5 * dj * math.log(2 * math.pi)
                - math.log(ntr_k)
            )
            if dj > 1:
                Lm = np.linalg.cholesky(H[1:, 1:])
                mtr[k, :ntr_k] = solve_triangular(
                    Lm, train[:, 1:].T, lower=True
                ).T
                mte[k, : len(test)] = solve_triangular(
                    Lm, test[:, 1:].T, lower=True
                ).T
                mln[k] = (
                    -np.sum(np.log(np.diag(Lm)))
                    - 0.5 * (dj - 1) * math.log(2 * math.pi)
                    - math.log(ntr_k)
                )
        dtype = np.float64
        if dj > 1:
            out = ckde_cv_slogl(
                jnp.asarray(jtr.astype(dtype)),
                jnp.asarray(jte.astype(dtype)),
                jnp.asarray(mtr.astype(dtype)),
                jnp.asarray(mte.astype(dtype)),
                jnp.asarray(trm.astype(dtype)),
                jnp.asarray(tem.astype(dtype)),
                jnp.asarray(jln.astype(dtype)),
                jnp.asarray(mln.astype(dtype)),
                chunk=chunk,
            )
        else:
            out = kde_cv_slogl(
                jnp.asarray(jtr.astype(dtype)),
                jnp.asarray(jte.astype(dtype)),
                jnp.asarray(trm.astype(dtype)),
                jnp.asarray(tem.astype(dtype)),
                jnp.asarray(jln.astype(dtype)),
                chunk=chunk,
            )
        return float(out)

    # ------------------------------------------------------------ discrete
    def discrete_score(self, variable, parents) -> float:
        from ...factors.discrete import DiscreteFactor

        total = 0.0
        for (tr, te) in self.folds:
            f = DiscreteFactor(variable, list(parents))
            f.fit(self.df.take(tr))
            total += f.slogl(self.df.take(te))
        return total

    # ------------------------------------------------------------- generic
    def generic_score(self, model, node_type, variable, parents, args) -> float:
        a, kw = args.args(variable, node_type)
        total = 0.0
        for (tr, te) in self.folds:
            factor = node_type.new_factor(model, variable, list(parents), *a, **kw)
            try:
                factor.fit(self.df.take(tr))
            except SingularCovarianceData:
                return -math.inf
            total += factor.slogl(self.df.take(te))
        return total


class CVLikelihood(Score):
    """(reference cv_likelihood.{hpp,cpp})."""

    def __init__(self, df, k: int = 10, seed: int = 0,
                 construction_args: Arguments | None = None):
        self.df = DataFrame.wrap(df)
        self.cv = CrossValidation(self.df, k, seed)
        self.k = k
        self.seed = seed
        self.args = construction_args or Arguments()
        self._engine = _KFoldEngine(
            self.df, [self.cv.fold_indices(i) for i in range(k)]
        )

    def data(self):
        return self.df

    def cv_folds(self):
        return self.cv

    def local_score_node_type(self, model, node_type, variable, parents) -> float:
        parents = list(parents)
        from ...factors.ckde import CKDEType

        if node_type == LinearGaussianCPDType() and self._lg_ok(variable, parents):
            pos = {c: i for i, c in enumerate(self.df.continuous_columns())}
            fams = [(pos[variable], [pos[p] for p in parents])]
            return float(self._engine.lg_batch(fams)[0])
        if node_type == CKDEType() and self._lg_ok(variable, parents):
            selector = _ckde_selector(node_type, model, variable, parents, self.args)
            return self._engine.ckde_score(variable, parents, selector)
        if node_type == DiscreteFactorType():
            return self._engine.discrete_score(variable, parents)
        return self._engine.generic_score(
            model, node_type, variable, parents, self.args
        )

    def _lg_ok(self, variable, parents) -> bool:
        return not self.df.is_discrete(variable) and not any(
            self.df.is_discrete(p) for p in parents
        )

    def local_score_batch(self, model, families) -> np.ndarray:
        norm = []
        for fam in families:
            if len(fam) == 3:
                v, ps, nt = fam
                if nt is None:
                    nt = self._node_type(model, v)
            else:
                v, ps = fam
                nt = self._node_type(model, v)
            norm.append((v, list(ps), nt))
        out = np.empty(len(norm))
        lg_idx = [
            i
            for i, (v, ps, nt) in enumerate(norm)
            if nt == LinearGaussianCPDType() and self._lg_ok(v, ps)
        ]
        pos = {c: i for i, c in enumerate(self.df.continuous_columns())}
        if lg_idx:
            fams = [
                (pos[norm[i][0]], [pos[p] for p in norm[i][1]]) for i in lg_idx
            ]
            out[np.array(lg_idx)] = self._engine.lg_batch(fams)
        for i, (v, ps, nt) in enumerate(norm):
            if i in set(lg_idx):
                continue
            out[i] = self.local_score_node_type(model, nt, v, ps)
        return out

    def ToString(self) -> str:
        return "CVLikelihood"


class HoldoutLikelihood(Score):
    """(reference holdout_likelihood.{hpp,cpp})."""

    def __init__(self, df, test_ratio: float = 0.2, seed: int = 0,
                 construction_args: Arguments | None = None):
        self.df = DataFrame.wrap(df)
        self.holdout = HoldOut(self.df, test_ratio, seed)
        self.args = construction_args or Arguments()
        self._train = self.holdout.training_data()
        self._test = self.holdout.test_data()

    def data(self):
        return self._train

    def training_data(self):
        return self._train

    def test_data(self):
        return self._test

    def local_score_node_type(self, model, node_type, variable, parents) -> float:
        parents = list(parents)
        a, kw = self.args.args(variable, node_type)
        factor = node_type.new_factor(model, variable, parents, *a, **kw)
        try:
            factor.fit(self._train)
        except SingularCovarianceData:
            return -math.inf
        return factor.slogl(self._test)

    def local_score_batch(self, model, families) -> np.ndarray:
        norm = []
        for fam in families:
            if len(fam) == 3:
                v, ps, nt = fam
                if nt is None:
                    nt = self._node_type(model, v)
            else:
                v, ps = fam
                nt = self._node_type(model, v)
            norm.append((v, list(ps), nt))
        out = np.empty(len(norm))
        cont = self._train.continuous_columns()
        pos = {c: i for i, c in enumerate(cont)}
        lg_idx = [
            i
            for i, (v, ps, nt) in enumerate(norm)
            if nt == LinearGaussianCPDType()
            and not self._train.is_discrete(v)
            and not any(self._train.is_discrete(p) for p in ps)
        ]
        if lg_idx:
            import jax.numpy as jnp

            from ...ops.gaussian import batched_lg_holdout_loglik

            tv, tvalid = self._train.device_matrix(cont)
            sv, svalid = self._test.device_matrix(cont)
            F = len(lg_idx)
            Fb = _next_pow2(F, 8)
            P = max((len(norm[i][1]) for i in lg_idx), default=0)
            Pb = _next_pow2(max(P, 1))
            var_idx = np.zeros(Fb, np.int32)
            parent_idx = np.zeros((Fb, Pb), np.int32)
            parent_mask = np.zeros((Fb, Pb), np.asarray(tv).dtype)
            for f, i in enumerate(lg_idx):
                var_idx[f] = pos[norm[i][0]]
                for j, p in enumerate(norm[i][1]):
                    parent_idx[f, j] = pos[p]
                    parent_mask[f, j] = 1.0
            scores = batched_lg_holdout_loglik(
                tv, tvalid, sv, svalid,
                jnp.asarray(var_idx),
                jnp.asarray(parent_idx),
                jnp.asarray(parent_mask),
            )
            out[np.array(lg_idx)] = np.asarray(scores, dtype=np.float64)[:F]
        for i, (v, ps, nt) in enumerate(norm):
            if i in set(lg_idx):
                continue
            out[i] = self.local_score_node_type(model, nt, v, ps)
        return out

    def ToString(self) -> str:
        return "HoldoutLikelihood"


class ValidatedLikelihood(ValidatedScore):
    """Main channel: CV over the holdout-training part; validation channel:
    holdout test (reference validated_likelihood.hpp:12-80)."""

    def __init__(self, df, test_ratio: float = 0.2, k: int = 10, seed: int = 0,
                 construction_args: Arguments | None = None):
        self.df = DataFrame.wrap(df)
        self.holdout = HoldoutLikelihood(
            self.df, test_ratio, seed, construction_args
        )
        self.cv = CVLikelihood(
            self.holdout.training_data(), k, seed, construction_args
        )

    def data(self):
        return self.cv.df

    def training_data(self):
        return self.holdout.training_data()

    def holdout_lik(self):
        return self.holdout

    def cv_lik(self):
        return self.cv

    def local_score_node_type(self, model, node_type, variable, parents) -> float:
        return self.cv.local_score_node_type(model, node_type, variable, parents)

    def local_score_batch(self, model, families) -> np.ndarray:
        return self.cv.local_score_batch(model, families)

    def vlocal_score_node_type(self, model, node_type, variable, parents) -> float:
        return self.holdout.local_score_node_type(
            model, node_type, variable, parents
        )

    def vlocal_score_batch(self, model, families) -> np.ndarray:
        return self.holdout.local_score_batch(model, families)

    def ToString(self) -> str:
        return "ValidatedLikelihood"
