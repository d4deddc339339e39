"""Behavior-port of the reference's DynamicBayesianNetwork logl oracle
(tests/models/DynamicBayesianNetwork_test.py:92-205): the first
markovian_order rows are scored by the STATIC network (row i maps variable v
to node ``v_t_{m-i}`` with evidence values read from the initial window),
every later row by the TRANSITION network with a shifting evidence window.
"""

import re

import numpy as np
import pytest
from scipy.stats import norm

from data_gen import normal_chain_data
from pybnesian_tpu import DynamicDataFrame
from pybnesian_tpu import DynamicGaussianNetwork

DF = normal_chain_data(900, seed=21)
M = 2  # markovian order


def lg_logl_row(value, ev_values, beta, variance):
    mean = beta[0] + np.dot(beta[1:], ev_values)
    return norm(mean, np.sqrt(variance)).logpdf(value)


def oracle_logl(dbn, test_df):
    m = dbn.markovian_order()
    ll = np.zeros(len(test_df))
    head = test_df.head(m)
    for i in range(m):
        for v in dbn.variables():
            node = f"{v}_t_{m - i}"
            cpd = dbn.static_bn().cpd(node)
            ev_vals = []
            for e in cpd.evidence():
                g = re.search(r"(.*)_t_(\d+)", e)
                ev_vals.append(head.loc[m - int(g[2]), g[1]])
            ll[i] += lg_logl_row(
                test_df.loc[i, v], ev_vals, cpd.beta, cpd.variance
            )
    for i in range(m, len(test_df)):
        for v in dbn.variables():
            node = f"{v}_t_0"
            cpd = dbn.transition_bn().cpd(node)
            ev_vals = []
            for e in cpd.evidence():
                g = re.search(r"(.*)_t_(\d+)", e)
                ev_vals.append(test_df.loc[i - int(g[2]), g[1]])
            ll[i] += lg_logl_row(
                test_df.loc[i, v], ev_vals, cpd.beta, cpd.variance
            )
    return ll


@pytest.fixture(scope="module")
def fitted_dbn():
    dbn = DynamicGaussianNetwork(["a", "b", "c", "d"], M)
    st = dbn.static_bn()
    for s, t in [("a", "c"), ("b", "c"), ("c", "d")]:
        st.add_arc(f"{s}_t_2", f"{t}_t_2")
        st.add_arc(f"{s}_t_1", f"{t}_t_1")
    tr = dbn.transition_bn()
    for v in ["a", "b", "c", "d"]:
        tr.add_arc(f"{v}_t_2", f"{v}_t_0")
        tr.add_arc(f"{v}_t_1", f"{v}_t_0")
    dbn.fit(DF)
    return dbn


def test_fit_parts_lifecycle():
    dbn = DynamicGaussianNetwork(["a", "b", "c", "d"], M)
    assert not dbn.fitted()
    assert not dbn.static_bn().fitted()
    assert not dbn.transition_bn().fitted()
    dbn.fit(DF)
    assert dbn.fitted()

    ddf = DynamicDataFrame(DF, M)
    dbn2 = DynamicGaussianNetwork(["a", "b", "c", "d"], M)
    dbn2.static_bn().fit(ddf.static_df())
    assert not dbn2.fitted()
    assert dbn2.static_bn().fitted()
    dbn2.transition_bn().fit(ddf.transition_df())
    assert dbn2.fitted()


def test_logl_matches_row_routing_oracle(fitted_dbn):
    test_df = normal_chain_data(80, seed=22)
    expected = oracle_logl(fitted_dbn, test_df)
    got = fitted_dbn.logl(test_df)
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)


def test_slogl_matches_oracle_sum(fitted_dbn):
    test_df = normal_chain_data(80, seed=23)
    expected = oracle_logl(fitted_dbn, test_df).sum()
    assert fitted_dbn.slogl(test_df) == pytest.approx(expected, rel=1e-8)
