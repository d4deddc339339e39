"""Round-5 native all-LG tier (_native/lgfast.c + the interned-template
fast lane in models/base.py): numeric-guard fallbacks, template-cache
correctness across types, copy-on-write graph semantics, and slogl
consistency contracts."""

import numpy as np
import pandas as pd
import pytest

import pybnesian_tpu as pbn
from pybnesian_tpu.models.base import _lgfast_mod


pytestmark = pytest.mark.skipif(
    _lgfast_mod() is None, reason="no native toolchain"
)

ARCS = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]


def _df(n=500, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.normal(3, 0.5, n)
    b = 2.5 - 1.3 * a + rng.normal(0, 0.6, n)
    c = -4.4 - 1.1 * a + rng.normal(0, 0.8, n)
    d = 0.5 * b + 0.7 * c + rng.normal(0, 0.4, n)
    return pd.DataFrame({"a": a, "b": b, "c": c, "d": d})


def test_native_fit_matches_numpy_fast_path():
    df = _df()
    g1 = pbn.GaussianNetwork(list(df.columns), ARCS)
    g1.fit(df)
    assert g1._lgfs is not None  # native lane engaged
    # force the generic numpy path via a wrapped frame
    g2 = pbn.GaussianNetwork(list(df.columns), ARCS)
    g2.fit(pbn.DataFrame.wrap(df))
    assert g2._lgfs is None
    for n in "abcd":
        np.testing.assert_allclose(
            g1.cpd(n).beta, g2.cpd(n).beta, rtol=1e-9
        )
        assert np.isclose(g1.cpd(n).variance, g2.cpd(n).variance, rtol=1e-9)


def test_constant_column_routes_to_generic_ladder():
    df = _df()
    df["b"] = 1.0  # zero-variance parent: the C guard must flag, and the
    # generic ladder owns the degenerate semantics
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    assert g.fitted()
    assert np.isfinite(g.cpd("d").variance)


def test_template_cache_distinguishes_types():
    df = _df()
    nodes = list(df.columns)
    g = pbn.GaussianNetwork(nodes, ARCS)
    k = pbn.KDENetwork(nodes, ARCS)
    assert type(g.type()) is not type(k.type())
    g.fit(df)
    k.fit(df)
    from pybnesian_tpu.factors.ckde import CKDE

    assert isinstance(k.cpd("a"), CKDE)  # KDE net never got LG factors


def test_cow_graph_materializes_on_mutation():
    df = _df()
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    s1 = g.slogl(df)
    g.remove_arc("b", "d")  # materializes the COW graph + invalidates
    g.fit(df)
    assert g.cpd("d").evidence() == ["c"]
    assert g.slogl(df) != s1
    # the template prototype must be untouched: a fresh model still has
    # the original arcs
    g2 = pbn.GaussianNetwork(list(df.columns), ARCS)
    assert sorted(g2.arcs()) == sorted(ARCS)


def test_slogl_equals_factor_sum_exactly_pandas_and_wrapped():
    df = _df()
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    # the reference's bitwise contract, across BOTH entry frame types
    assert g.slogl(df) == sum(g.cpd(n).slogl(df) for n in g.nodes())
    w = pbn.DataFrame.wrap(df)
    assert g.slogl(w) == sum(g.cpd(n).slogl(w) for n in g.nodes())


def test_user_param_edit_invalidates_fast_state():
    df = _df()
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    base = g.slogl(df)
    cpd = g.cpd("a")
    cpd.beta = np.array([99.0])  # property setter replaces the buffer
    shifted = g.slogl(df)
    assert shifted < base - 1000  # the edit is visible in model slogl
    cpd.variance = 123.0
    assert g.slogl(df) != shifted


def test_nan_rows_route_to_generic_null_semantics():
    df = _df()
    df.loc[::7, "c"] = np.nan
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    v = g.slogl(df)
    # generic semantics: each factor skips ITS OWN null rows
    ref = sum(g.cpd(n).slogl(pbn.DataFrame.wrap(df)) for n in g.nodes())
    assert np.isclose(v, ref)


def test_sample_deterministic_and_distributed_correctly():
    df = _df(2000)
    g = pbn.GaussianNetwork(list(df.columns), ARCS)
    g.fit(df)
    s1 = g.sample(50_000, seed=3).to_pandas()
    s2 = g.sample(50_000, seed=3).to_pandas()
    pd.testing.assert_frame_equal(s1, s2)
    assert abs(s1["a"].mean() - g.cpd("a").beta[0]) < 0.02
    assert abs(s1["a"].var() - g.cpd("a").variance) < 0.02
    # regression of b on a recovers the fitted slope
    slope = np.polyfit(s1["a"], s1["b"], 1)[0]
    assert abs(slope - g.cpd("b").beta[1]) < 0.03
