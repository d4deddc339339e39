"""Parity behaviors surfaced by running the reference's own test suite
against this package (all 131 reference tests pass via an import shim):
cv_lik/holdout_lik properties, pure-virtual messages, reference-signature
``data_default_node_type(arrow_type)`` extensions, type-specific ``new_bn``,
clone preserving Python-subclass extra state, and interface nodes staying
Unknown in ``set_unknown_node_types``.
"""

import numpy as np
import pyarrow as pa
import pytest

from data_gen import normal_chain_data
import pybnesian_tpu as pbn
from pybnesian_tpu.models.base import BayesianNetworkType

DF = normal_chain_data(300, seed=41)


def test_validated_likelihood_component_properties():
    vl = pbn.ValidatedLikelihood(DF, k=5, seed=0)
    # reference exposes these as read-only PROPERTIES
    # (pybindings_scores.cpp:644-647)
    assert isinstance(vl.cv_lik, pbn.CVLikelihood)
    assert isinstance(vl.holdout_lik, pbn.HoldoutLikelihood)
    m = pbn.GaussianNetwork(["a", "b"])
    assert np.isfinite(vl.cv_lik.local_score(m, "a", []))


def test_factor_type_pure_virtual_message():
    class FType(pbn.FactorType):
        pass

    with pytest.raises(RuntimeError) as ex:
        FType().new_factor(pbn.GaussianNetwork(["a"]), "a", [])
    assert 'Tried to call pure virtual function "FactorType::new_factor"' in str(
        ex.value
    )


def test_holdout_test_ratio_message():
    with pytest.raises(ValueError, match="test_ratio must be a number"):
        pbn.HoldOut(DF, test_ratio=10)


def test_reference_signature_data_default_node_type():
    class RefStyleType(BayesianNetworkType):
        def is_homogeneous(self):
            return False

        def data_default_node_type(self, dt):
            # the reference passes the column's Arrow DataType
            # (BayesianNetwork.hpp:671)
            if dt.equals(pa.float64()) or dt.equals(pa.float32()):
                return [pbn.LinearGaussianCPDType()]
            raise ValueError("incompatible")

    m = pbn.BayesianNetwork(RefStyleType(), ["a", "b"], [("a", "b")])
    m.fit(DF)
    assert m.cpd("b").type() == pbn.LinearGaussianCPDType()


def test_hc_returns_specific_network_class():
    out = pbn.hc(DF, bn_type=pbn.GaussianNetworkType(), score="bic")
    assert type(out) is pbn.GaussianNetwork
    assert type(pbn.SemiparametricBNType().new_bn(["a"])) is pbn.SemiparametricBN
    assert (
        type(pbn.CLGNetworkType().new_cbn(["a"], ["b"]))
        is pbn.ConditionalCLGNetwork
    )


def test_estimate_preserves_subclass_and_extra_state():
    class MyBN(pbn.BayesianNetwork):
        def __init__(self, variables):
            super().__init__(pbn.GaussianNetworkType(), variables)
            self.extra_data = "extra"

        def __getstate_extra__(self):
            return self.extra_data

        def __setstate_extra__(self, extra):
            self.extra_data = extra

    start = MyBN(["a", "b", "c", "d"])
    out = pbn.GreedyHillClimbing().estimate(
        pbn.ArcOperatorSet(), pbn.BIC(DF), start, max_iters=2
    )
    assert type(out) is MyBN
    assert out.extra_data == "extra"


def test_set_unknown_node_types_skips_interface_nodes():
    class PickyType(BayesianNetworkType):
        def is_homogeneous(self):
            return False

        def data_default_node_type(self, df, variable):
            if df.is_continuous(variable):
                return [pbn.LinearGaussianCPDType()]
            raise ValueError("only continuous accepted")

    cbn = pbn.ConditionalBayesianNetwork(PickyType(), ["a", "b"], ["z"])
    import pandas as pd

    df = DF[["a", "b"]].copy()
    df["z"] = pd.Categorical(["u", "v"] * (len(df) // 2))
    # interface node z is categorical; resolving it would raise — the
    # reference only resolves nodes() (BayesianNetwork.hpp:727)
    cbn.set_unknown_node_types(df)
    assert cbn.node_type("a") == pbn.LinearGaussianCPDType()
    assert cbn.node_type("z") == pbn.UnknownFactorType()


def test_discrete_child_continuous_parent_scores_minus_inf():
    import pandas as pd

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "d": pd.Categorical(rng.choice(["x", "y"], 200)),
            "c": rng.normal(size=200),
        }
    )
    m = pbn.CLGNetwork(["d", "c"])
    bic = pbn.BIC(df)
    s = bic.local_score_node_type(m, pbn.DiscreteFactorType(), "d", ["c"])
    assert s == -np.inf
    bde = pbn.BDe(df)
    assert bde.local_score_node_type(
        m, pbn.DiscreteFactorType(), "d", ["c"]
    ) == -np.inf
