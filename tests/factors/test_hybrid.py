import pickle

import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.data import DataFrame
from pybnesian_tpu.factors import LinearGaussianCPD
from pybnesian_tpu.factors.base import Assignment
from pybnesian_tpu.factors.ckde import CKDEType
from pybnesian_tpu.factors.hybrid import CLinearGaussianCPD, HCKDE
from pybnesian_tpu.factors.lineargaussian import LinearGaussianCPDType
from data_gen import mixed_data


def test_clg_fit_and_logl():
    df = mixed_data(3000)
    f = CLinearGaussianCPD("Y", ["X", "B"])
    f.fit(df)
    assert f.fitted()
    assert f.type() == LinearGaussianCPDType()
    ll = f.logl(df)
    assert not np.isnan(ll).any()
    # oracle: fit separate LG per B category
    wrapped = DataFrame.wrap(df)
    for bi, bcat in enumerate(wrapped.categories("B")):
        rows = df[df["B"] == bcat]
        lg = LinearGaussianCPD("Y", ["X"])
        lg.fit(rows)
        sub = f.conditional_factor(Assignment({"B": bcat}))
        np.testing.assert_allclose(sub.beta, lg.beta, rtol=1e-9)
        np.testing.assert_allclose(sub.variance, lg.variance, rtol=1e-9)
        mask = (df["B"] == bcat).to_numpy()
        np.testing.assert_allclose(ll[mask], lg.logl(rows), rtol=1e-9)


def test_clg_no_discrete_evidence_is_plain_lg():
    df = mixed_data(500)
    f = CLinearGaussianCPD("Y", ["X"])
    f.fit(df)
    lg = LinearGaussianCPD("Y", ["X"])
    lg.fit(df)
    np.testing.assert_allclose(f.logl(df), lg.logl(df), rtol=1e-12)


def test_hckde_fit_logl():
    df = mixed_data(1500)
    f = HCKDE("Y", ["X", "A"])
    f.fit(df)
    assert f.type() == CKDEType()
    ll = f.logl(df)
    assert np.isfinite(ll).all()
    # per-assignment factor is a CKDE fitted on the slice
    from pybnesian_tpu.factors.ckde import CKDE

    wrapped = DataFrame.wrap(df)
    cat = wrapped.categories("A")[0]
    sub = f.conditional_factor(Assignment({"A": cat}))
    ref = CKDE("Y", ["X"])
    ref.fit(df[df["A"] == cat])
    mask = (df["A"] == cat).to_numpy()
    np.testing.assert_allclose(ll[mask], ref.logl(df[df["A"] == cat]), rtol=1e-9)


def test_unfittable_config_yields_nan():
    # config with 2 rows: LG with 1 parent needs > 2 rows for finite variance
    df = pd.DataFrame(
        {
            "B": pd.Categorical(["b1"] * 50 + ["b2"] * 2),
            "X": np.random.default_rng(0).normal(size=52),
            "Y": np.random.default_rng(1).normal(size=52),
        }
    )
    f = CLinearGaussianCPD("Y", ["X", "B"])
    f.fit(df)
    ll = f.logl(df)
    assert np.isnan(ll[-2:]).all()
    assert np.isfinite(ll[:-2]).all()
    assert np.isclose(f.slogl(df), np.nansum(ll))


def test_type_dispatch_via_new_factor():
    from pybnesian_tpu.models import CLGNetwork

    df = mixed_data(800)
    bn = CLGNetwork(["A", "B", "X", "Y"], [("A", "X"), ("X", "Y"), ("B", "Y")])
    bn.fit(df)
    assert isinstance(bn.cpd("X"), CLinearGaussianCPD)
    assert isinstance(bn.cpd("Y"), CLinearGaussianCPD)
    ll = bn.logl(df)
    assert np.isfinite(ll).all()
    s = bn.sample(500, seed=0).to_pandas()
    assert set(s.columns) == {"A", "B", "X", "Y"}


def test_clg_network_blocks_continuous_to_discrete():
    from pybnesian_tpu.models import CLGNetwork

    df = mixed_data(100)
    bn = CLGNetwork(["A", "X"])
    bn.set_unknown_node_types(df)
    assert not bn.can_add_arc("X", "A")
    assert bn.can_add_arc("A", "X")


def test_hybrid_sampling():
    df = mixed_data(3000)
    f = CLinearGaussianCPD("Y", ["X", "B"])
    f.fit(df)
    ev = df[["X", "B"]].head(2000)
    s = np.asarray(f.sample(2000, ev, seed=0))
    assert np.isfinite(s).all()
    # conditional mean tracks the per-category regression
    b1 = (ev["B"] == "b1").to_numpy()
    sub = f.conditional_factor(Assignment({"B": "b1"}))
    pred = sub.beta[0] + sub.beta[1] * ev["X"].to_numpy()[b1]
    assert abs((s[b1] - pred).mean()) < 0.1


def test_hybrid_pickle():
    df = mixed_data(500)
    f = CLinearGaussianCPD("Y", ["X", "B"])
    f.fit(df)
    f2 = pickle.loads(pickle.dumps(f))
    np.testing.assert_allclose(f2.logl(df), f.logl(df), equal_nan=True)
