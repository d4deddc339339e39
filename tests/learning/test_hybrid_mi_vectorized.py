"""Vectorized hybrid-MI statistics vs a naive per-config oracle.

Round-4 rewrite: `_grouped_cov_dets` accumulates per-config counts, sums
and outer-product sums in ONE pass (weighted bincounts), and the `_cmi_*`
config loops are numpy-vectorized. These tests pin the results against the
straightforward per-config masking implementation (the reference's
semantics, mutual_information.cpp:921-1033) and check the cost no longer
scales with the number of discrete configurations.
"""

import time

import numpy as np
import pandas as pd

from pybnesian_tpu import MutualInformation


def _naive_grouped_cov_dets(mat, config_idx, n_configs, valid):
    d = mat.shape[1]
    dets = np.full(n_configs, np.nan)
    for k in range(n_configs):
        rows = valid & (config_idx == k)
        n = int(rows.sum())
        if n <= d:
            continue
        sub = mat[rows]
        centred = sub - sub.mean(axis=0, keepdims=True)
        cov = centred.T @ centred / (n - 1)
        dets[k] = np.linalg.det(cov)
    return dets


def _hybrid_frame(n=3000, seed=0, cards=(3, 4), with_nulls=False):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, cards[0], n)
    b = (a + rng.integers(0, cards[1], n)) % cards[1]
    x = rng.normal(0, 1, n) + 0.5 * a
    y = 0.7 * x + rng.normal(0, 1, n) + 0.3 * b
    w = rng.normal(0, 1, n)
    df = pd.DataFrame({
        "A": pd.Categorical(a.astype(str)),
        "B": pd.Categorical(b.astype(str)),
        "x": x,
        "y": y,
        "w": w,
    })
    if with_nulls:
        df.loc[rng.choice(n, n // 50, replace=False), "x"] = np.nan
        df.loc[rng.choice(n, n // 50, replace=False), "A"] = None
    return df


def test_grouped_cov_dets_matches_naive():
    df = _hybrid_frame(2000, seed=1)
    t = MutualInformation(df)
    valid = t.df.combined_mask("A", "B", "x", "y")
    zidx, zc, _ = t._config_index(["A", "B"], valid)
    fast = t._grouped_cov_dets(["x", "y"], zidx, zc, valid)
    mat = t.df.to_numpy(["x", "y"], drop_null=False, dtype=np.float64)
    naive = _naive_grouped_cov_dets(mat, zidx, zc, valid)
    np.testing.assert_allclose(fast, naive, rtol=1e-9, equal_nan=True)


def test_grouped_cov_dets_with_nulls_matches_naive():
    df = _hybrid_frame(2000, seed=2, with_nulls=True)
    t = MutualInformation(df)
    valid = t.df.combined_mask("A", "x", "y")
    zidx, zc, _ = t._config_index(["A"], valid)
    fast = t._grouped_cov_dets(["x", "y"], zidx, zc, valid)
    mat = t.df.to_numpy(["x", "y"], drop_null=False, dtype=np.float64)
    naive = _naive_grouped_cov_dets(mat, zidx, zc, valid)
    np.testing.assert_allclose(fast, naive, rtol=1e-9, equal_nan=True)


def _naive_mi(test, x, y, z):
    """Reference semantics re-implemented with per-config scalar loops
    (the pre-vectorization algorithm)."""
    import math

    from pybnesian_tpu.learning.independences.hybrid_mi import entropy_mvn

    df = test.df
    zlist = list(z)
    dz = [e for e in zlist if df.is_discrete(e)]
    cz = [e for e in zlist if not df.is_discrete(e)]
    valid = df.combined_mask(x, y, *zlist)
    n = int(valid.sum())

    def grouped(cont_vars, idx, n_configs):
        mat = df.to_numpy(cont_vars, drop_null=False, dtype=np.float64)
        return _naive_grouped_cov_dets(mat, idx, n_configs, valid)

    zidx, zc, _ = test._config_index(dz, valid)
    if df.is_discrete(x) and df.is_discrete(y):
        kx, ky = df.cardinality(x), df.cardinality(y)
        cx = df.codes(x).astype(np.int64)
        cy = df.codes(y).astype(np.int64)
        xyz_idx = cx + kx * cy + kx * ky * zidx
        xz_idx = cx + kx * zidx
        yz_idx = cy + ky * zidx
        counts_xyz = np.bincount(xyz_idx[valid], minlength=kx * ky * zc)
        counts_xz = np.bincount(xz_idx[valid], minlength=kx * zc)
        counts_yz = np.bincount(yz_idx[valid], minlength=ky * zc)
        counts_z = np.bincount(zidx[valid], minlength=zc)
        det_xyz = grouped(cz, xyz_idx, kx * ky * zc)
        det_xz = grouped(cz, xz_idx, kx * zc)
        det_yz = grouped(cz, yz_idx, ky * zc)
        det_z = grouped(cz, zidx, zc)
        mi = 0.0
        dcz = len(cz)
        for k in range(zc):
            if counts_z[k] == 0:
                continue
            pz = counts_z[k] / n
            for i in range(kx):
                for j in range(ky):
                    idx = k * kx * ky + j * kx + i
                    cnt = counts_xyz[idx]
                    if cnt == 0:
                        continue
                    pxyz = cnt / n
                    pxz = counts_xz[k * kx + i] / n
                    pyz = counts_yz[k * ky + j] / n
                    h_xyz = entropy_mvn(dcz, det_xyz[idx])
                    term = math.log(pz * pxyz / (pxz * pyz))
                    if math.isfinite(h_xyz):
                        term -= h_xyz
                    mi += pxyz * term
            for i in range(kx):
                cnt = counts_xz[k * kx + i]
                if cnt > 0 and math.isfinite(
                    entropy_mvn(dcz, det_xz[k * kx + i])
                ):
                    mi += (cnt / n) * entropy_mvn(dcz, det_xz[k * kx + i])
            for j in range(ky):
                cnt = counts_yz[k * ky + j]
                if cnt > 0 and math.isfinite(
                    entropy_mvn(dcz, det_yz[k * ky + j])
                ):
                    mi += (cnt / n) * entropy_mvn(dcz, det_yz[k * ky + j])
            if math.isfinite(entropy_mvn(dcz, det_z[k])):
                mi -= pz * entropy_mvn(dcz, det_z[k])
        return max(mi, 0.0)
    if df.is_discrete(x) or df.is_discrete(y):
        xd, yc_ = (x, y) if df.is_discrete(x) else (y, x)
        kx = df.cardinality(xd)
        cx = df.codes(xd).astype(np.int64)
        xz_idx = cx + kx * zidx
        counts_xz = np.bincount(xz_idx[valid], minlength=kx * zc)
        counts_z = np.bincount(zidx[valid], minlength=zc)
        det_a = grouped([yc_, *cz], xz_idx, kx * zc)
        det_b = grouped(cz, xz_idx, kx * zc) if cz else None
        det_c = grouped([yc_, *cz], zidx, zc)
        det_d = grouped(cz, zidx, zc) if cz else None
        mi = 0.0
        for k in range(zc):
            if counts_z[k] == 0:
                continue
            pz = counts_z[k] / n
            for i in range(kx):
                idx = k * kx + i
                cnt = counts_xz[idx]
                if cnt == 0:
                    continue
                pxz = cnt / n
                h = entropy_mvn(len(cz) + 1, det_a[idx])
                if math.isfinite(h):
                    mi -= pxz * h
                if cz:
                    h = entropy_mvn(len(cz), det_b[idx])
                    if math.isfinite(h):
                        mi += pxz * h
            h = entropy_mvn(len(cz) + 1, det_c[k])
            if math.isfinite(h):
                mi += pz * h
            if cz:
                h = entropy_mvn(len(cz), det_d[k])
                if math.isfinite(h):
                    mi -= pz * h
        return max(mi, 0.0)
    counts = np.bincount(zidx[valid], minlength=zc)
    det_xyz = grouped([x, y, *cz], zidx, zc)
    det_xz = grouped([x, *cz], zidx, zc)
    det_yz = grouped([y, *cz], zidx, zc)
    det_z = grouped(cz, zidx, zc) if cz else None
    mi = 0.0
    for k in range(zc):
        if counts[k] == 0:
            continue
        pz = counts[k] / n
        term = (
            entropy_mvn(len(cz) + 1, det_xz[k])
            + entropy_mvn(len(cz) + 1, det_yz[k])
            - entropy_mvn(len(cz) + 2, det_xyz[k])
        )
        if cz:
            term -= entropy_mvn(len(cz), det_z[k])
        if math.isfinite(term):
            mi += pz * term
    return max(mi, 0.0)


def test_all_cmi_cases_match_naive_oracle():
    df = _hybrid_frame(3000, seed=3)
    t = MutualInformation(df)
    cases = [
        ("x", "y", ("A",)),            # both continuous, discrete z
        ("x", "y", ("A", "w")),        # both continuous, mixed z
        ("A", "x", ("B", "w")),        # mixed, mixed z
        ("A", "B", ("w",)),            # both discrete, continuous z
        ("A", "B", ("w", "x")),        # both discrete, mixed z
    ]
    for (x, y, z) in cases:
        got = t.mi(x, y, *z)
        want = _naive_mi(t, x, y, z)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"case {(x, y, z)}")


def test_all_cmi_cases_match_naive_oracle_with_nulls():
    df = _hybrid_frame(3000, seed=4, with_nulls=True)
    t = MutualInformation(df)
    for (x, y, z) in [("x", "y", ("A",)), ("A", "x", ("B", "w")),
                      ("A", "B", ("w",))]:
        got = t.mi(x, y, *z)
        want = _naive_mi(t, x, y, z)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"case {(x, y, z)}")


def test_wide_cardinality_cost_is_config_independent():
    """The one-pass accumulation must not slow down with config count:
    p-value cost at ~1000 discrete configs stays within 8x of the
    2-config cost (the old per-config masking was >100x)."""
    rng = np.random.default_rng(9)
    n = 20000
    df = pd.DataFrame({
        "D1": pd.Categorical(rng.integers(0, 10, n).astype(str)),
        "D2": pd.Categorical(rng.integers(0, 10, n).astype(str)),
        "D3": pd.Categorical(rng.integers(0, 10, n).astype(str)),
        "S": pd.Categorical(rng.integers(0, 2, n).astype(str)),
        "x": rng.normal(0, 1, n),
        "y": rng.normal(0, 1, n),
    })
    t = MutualInformation(df)
    t.pvalue("x", "y", "S")          # warm caches
    t0 = time.perf_counter()
    for _ in range(3):
        t.pvalue("x", "y", "S")      # 2 configs
    narrow = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        t.pvalue("x", "y", "D1", "D2", "D3")  # 1000 configs
    wide = time.perf_counter() - t0
    assert wide < 8 * narrow + 0.5, (narrow, wide)


def test_grouped_cov_dets_separated_config_means():
    """Configurations whose means dwarf the within-config spread: the
    round-5 per-group-centred second pass keeps full precision where the
    raw-moment assembly (sq − n·μμᵀ) cancels catastrophically."""
    rng = np.random.default_rng(7)
    n = 4000
    a = rng.integers(0, 4, n)
    x = rng.normal(0, 1e-3, n) + 1e7 * a        # means ~1e7 apart, σ=1e-3
    y = 0.5 * x + rng.normal(0, 1e-3, n) - 5e6 * a
    df = pd.DataFrame({"A": pd.Categorical(a.astype(str)), "x": x, "y": y})
    t = MutualInformation(df)
    valid = t.df.combined_mask("A", "x", "y")
    zidx, zc, _ = t._config_index(["A"], valid)
    fast = t._grouped_cov_dets(["x", "y"], zidx, zc, valid)
    mat = t.df.to_numpy(["x", "y"], drop_null=False, dtype=np.float64)
    naive = _naive_grouped_cov_dets(mat, zidx, zc, valid)
    np.testing.assert_allclose(fast, naive, rtol=1e-6)
    # determinants must be positive and near (1e-3)^4-scale, not noise
    assert np.all(fast[np.isfinite(fast)] > 0)
