"""Model-level batched CKDE logl (one device launch for all KDE nodes) must
match the per-factor loop exactly (reference BNGeneric::logl semantics)."""

import numpy as np
import pandas as pd

from pybnesian_tpu import CKDE, KDENetwork, SemiparametricBN, CKDEType

from data_gen import normal_chain_data


def test_kdenetwork_batched_logl_matches_factors():
    df = normal_chain_data(300, seed=3)
    df.loc[4, "a"] = np.nan
    m = KDENetwork(["a", "b", "c", "d"], [("a", "b"), ("b", "c"), ("c", "d")])
    m.fit(df)
    test = normal_chain_data(80, seed=9)
    test.loc[2, "b"] = np.nan
    ref = sum(np.asarray(m.cpd(n).logl(test)) for n in ["a", "b", "c", "d"])
    np.testing.assert_allclose(m.logl(test), ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        m.slogl(test),
        sum(m.cpd(n).slogl(test) for n in ["a", "b", "c", "d"]),
        rtol=1e-9,
    )


def test_spbn_mixed_batched_logl():
    df = normal_chain_data(250, seed=5)
    m = SemiparametricBN(
        ["a", "b", "c", "d"], [("a", "b"), ("b", "c")],
        [("a", CKDEType()), ("c", CKDEType())],
    )
    m.fit(df)
    test = normal_chain_data(60, seed=11)
    ref = sum(np.asarray(m.cpd(n).logl(test)) for n in ["a", "b", "c", "d"])
    np.testing.assert_allclose(m.logl(test), ref, rtol=1e-9, atol=1e-9)
