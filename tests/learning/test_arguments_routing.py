"""Args/Kwargs/Arguments routing through fit and the likelihood scores
(reference factors/arguments.hpp:16-36; CKDE_test.py passes per-node
bandwidth selectors through Arguments)."""

import numpy as np

import pybnesian_tpu as pbn
from data_gen import normal_chain_data


def test_arguments_lookup_precedence():
    args = pbn.Arguments(
        {
            "x": pbn.Kwargs(bandwidth_selector=pbn.ScottsBandwidth()),
            pbn.CKDEType(): pbn.Kwargs(
                bandwidth_selector=pbn.NormalReferenceRule()
            ),
        }
    )
    # exact node name wins over the factor-type wildcard
    a, kw = args.args("x", pbn.CKDEType())
    assert type(kw["bandwidth_selector"]) is pbn.ScottsBandwidth
    a, kw = args.args("y", pbn.CKDEType())
    assert type(kw["bandwidth_selector"]) is pbn.NormalReferenceRule
    a, kw = args.args("y", pbn.LinearGaussianCPDType())
    assert a == () and kw == {}


def test_fit_routes_bandwidth_selector():
    df = normal_chain_data(300)
    model = pbn.KDENetwork(["a", "b"], [("a", "b")])
    model.fit(
        df,
        pbn.Arguments(
            {"b": pbn.Kwargs(bandwidth_selector=pbn.ScottsBandwidth())}
        ),
    )
    assert type(model.cpd("b").bandwidth_selector()) is pbn.ScottsBandwidth
    # untouched node keeps the default
    assert (
        type(model.cpd("a").bandwidth_selector()) is pbn.NormalReferenceRule
    )


def test_cvlikelihood_honors_arguments_selector():
    df = normal_chain_data(400)
    model = pbn.KDENetwork(["a", "b", "c", "d"])
    default_score = pbn.CVLikelihood(df, k=4, seed=0)
    scott_score = pbn.CVLikelihood(
        df,
        k=4,
        seed=0,
        construction_args=pbn.Arguments(
            {"b": pbn.Kwargs(bandwidth_selector=pbn.ScottsBandwidth())}
        ),
    )
    # NOTE: at d=2 Scott's rule and the normal-reference rule coincide
    # exactly (both n^(-1/3)); use d=1 and d=3 families where they differ.
    s_default = default_score.local_score(model, "b", [])
    s_scott = scott_score.local_score(model, "b", [])
    assert s_default != s_scott
    s_default3 = default_score.local_score(model, "b", ["a", "c"])
    s_scott3 = scott_score.local_score(model, "b", ["a", "c"])
    assert s_default3 != s_scott3
    # oracle: serial per-fold CKDE fits with the Scott selector
    ref = 0.0
    for i in range(4):
        tr, te = scott_score.cv.fold_indices(i)
        f = pbn.CKDE(
            "b", ["a", "c"], bandwidth_selector=pbn.ScottsBandwidth()
        )
        f.fit(scott_score.df.take(tr))
        ref += f.slogl(scott_score.df.take(te))
    np.testing.assert_allclose(s_scott3, ref, rtol=1e-6)


def test_holdout_honors_arguments_selector():
    df = normal_chain_data(400)
    model = pbn.KDENetwork(["a", "b"])
    score = pbn.HoldoutLikelihood(
        df,
        test_ratio=0.3,
        seed=0,
        construction_args=pbn.Arguments(
            {"b": pbn.Kwargs(bandwidth_selector=pbn.ScottsBandwidth())}
        ),
    )
    got = score.local_score(model, "b", ["a"])
    f = pbn.CKDE("b", ["a"], bandwidth_selector=pbn.ScottsBandwidth())
    f.fit(score.training_data())
    ref = f.slogl(score.test_data())
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_hc_with_arguments():
    df = normal_chain_data(400)
    model = pbn.hc(
        df,
        bn_type=pbn.KDENetworkType(),
        score="cv-lik",
        max_iters=2,
        num_folds=4,
    )
    assert model.type() == pbn.KDENetworkType()
