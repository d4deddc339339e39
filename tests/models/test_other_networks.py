import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu import (
    CKDE,
    CKDEType,
    DiscreteFactorType,
    HeterogeneousBN,
    KDENetwork,
    LinearGaussianCPDType,
    SemiparametricBN,
    UnknownFactorType,
)
from data_gen import mixed_data, normal_chain_data


def test_kde_network_fit_logl_sample():
    df = normal_chain_data(500)
    bn = KDENetwork(["a", "b", "c"], [("a", "b"), ("b", "c")])
    bn.fit(df)
    assert isinstance(bn.cpd("b"), CKDE)
    ll = bn.logl(df.head(100))
    assert np.isfinite(ll).all()
    s = bn.sample(200, seed=0).to_pandas()
    assert set(s.columns) == {"a", "b", "c"}
    # samples roughly in the data range
    assert abs(s["a"].mean() - df["a"].mean()) < 1.0


def test_spbn_mixed_types_fit_sample():
    df = normal_chain_data(500)
    bn = SemiparametricBN(
        ["a", "b", "c"],
        [("a", "b"), ("b", "c")],
        node_types=[("b", CKDEType())],
    )
    assert bn.node_type("b") == CKDEType()
    assert bn.node_type("a") == UnknownFactorType()
    bn.fit(df)
    assert bn.node_type("a") == LinearGaussianCPDType()
    assert isinstance(bn.cpd("b"), CKDE)
    s = bn.sample(150, seed=1).to_pandas()
    assert len(s) == 150


def test_heterogeneous_bn_with_type_map():
    df = mixed_data(800)
    bn = HeterogeneousBN(
        {
            "categorical": [DiscreteFactorType()],
            "float64": [LinearGaussianCPDType(), CKDEType()],
        },
        ["A", "B", "X", "Y"],
        [("A", "X"), ("X", "Y")],
    )
    bn.fit(df)
    assert bn.node_type("A") == DiscreteFactorType()
    assert bn.node_type("X") == LinearGaussianCPDType()
    ll = bn.logl(df.head(50))
    assert np.isfinite(ll).all()


def test_heterogeneous_bn_with_list():
    df = normal_chain_data(300)
    bn = HeterogeneousBN([CKDEType()], ["a", "b"], [("a", "b")])
    bn.fit(df)
    assert isinstance(bn.cpd("b"), CKDE)


def test_model_graph_delegation():
    df = normal_chain_data(100)
    bn = SemiparametricBN(["a", "b", "c"], [("a", "b"), ("b", "c")])
    assert bn.roots() == ["a"]
    assert bn.leaves() == ["c"]
    assert bn.topological_sort() == ["a", "b", "c"]
    assert bn.has_unknown_node_types()
    bn.set_unknown_node_types(df)
    assert not bn.has_unknown_node_types()


def test_heterogeneous_pyarrow_dtype_map():
    """Per-data-type default maps accept pyarrow DataType keys (reference
    MapDataToFactor, models/HeterogeneousBN.hpp:22-110)."""
    import pyarrow as pa
    import pandas as pd

    from pybnesian_tpu import (
        CKDEType,
        DiscreteFactorType,
        HeterogeneousBN,
        LinearGaussianCPDType,
    )

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "x": rng.normal(size=50).astype(np.float32),
            "y": rng.normal(size=50),
            "A": pd.Categorical(rng.choice(["u", "v"], 50)),
        }
    )
    het = HeterogeneousBN(
        {
            pa.float32(): [CKDEType()],
            pa.float64(): [LinearGaussianCPDType()],
            pa.dictionary(pa.int8(), pa.string()): [DiscreteFactorType()],
        },
        ["x", "y", "A"],
    )
    het.set_unknown_node_types(df)
    assert het.node_type("x") == CKDEType()
    assert het.node_type("y") == LinearGaussianCPDType()
    assert het.node_type("A") == DiscreteFactorType()
