"""End-to-end BASELINE config 5: dynamic BN structure (DMMHC) + posterior
inference (NUTS + SMC) over CLG parameters, chains sharded on the mesh."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from pybnesian_tpu import CLGNetwork, DynamicDataFrame
from pybnesian_tpu.inference import make_logdensity, nuts, sample_chains_sharded, smc
from data_gen import mixed_data


def test_clg_posterior_nuts():
    df = mixed_data(1500)
    model = CLGNetwork(["A", "B", "X", "Y"], [("A", "X"), ("X", "Y"), ("B", "Y")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)
    assert layout.slices["Y"][2] == "clg"
    samples, info = nuts(
        logp, init, jax.random.PRNGKey(0), num_samples=400, num_warmup=300,
        max_depth=5,
    )
    post = np.asarray(samples.mean(0))
    # the CLG block of Y: per-B-config regression on X; generator slope = 0.8
    lo, hi, _ = layout.slices["Y"]
    blocks = post[lo:hi].reshape(2, 3)  # 2 configs x (b0, b1, logvar)
    np.testing.assert_allclose(blocks[:, 1], 0.8, atol=0.1)
    # intercepts differ by B category (+1 vs -1)
    assert abs(abs(blocks[0, 0] - blocks[1, 0]) - 2.0) < 0.3


def test_clg_posterior_smc_agrees_with_nuts():
    df = mixed_data(800)
    model = CLGNetwork(["A", "X"], [("A", "X")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)

    def logprior(theta):
        return -0.5 * jnp.sum((theta - init) ** 2) * 1e-2

    def loglik(theta):
        return logp(theta)

    key = jax.random.PRNGKey(1)
    particles0 = init[None, :] + 0.3 * jax.random.normal(
        key, (256, init.shape[0])
    )
    particles, log_w, log_z = smc(
        logprior, loglik, particles0, jax.random.PRNGKey(2), num_steps=10,
        leapfrog_steps=5, step_size=0.02,
    )
    w = np.exp(np.asarray(log_w - jax.nn.logsumexp(log_w)))
    smc_mean = (np.asarray(particles) * w[:, None]).sum(0)
    samples, _ = nuts(
        logp, init, jax.random.PRNGKey(3), num_samples=400, num_warmup=300,
        max_depth=5,
    )
    nuts_mean = np.asarray(samples.mean(0))
    # compare only identifiable quantities: the CLG block of X (the discrete
    # node's logits are softmax-gauge-invariant, so raw values differ)
    lo, hi, kind = layout.slices["X"]
    assert kind == "clg"
    np.testing.assert_allclose(smc_mean[lo:hi], nuts_mean[lo:hi], atol=0.3)
    # and the A-marginal probabilities after softmax
    la, ha, _ = layout.slices["A"]

    def probs(v):
        logits = v[la:ha]
        e = np.exp(logits - logits.max())
        return e / e.sum()

    np.testing.assert_allclose(probs(smc_mean), probs(nuts_mean), atol=0.1)


def test_sharded_chains_over_bn_posterior():
    from pybnesian_tpu.parallel import make_mesh
    from pybnesian_tpu.models import GaussianNetwork
    from data_gen import normal_chain_data

    df = normal_chain_data(500)
    model = GaussianNetwork(["a", "b"], [("a", "b")])
    logp, layout, init = make_logdensity(model, df, dtype=np.float64)
    mesh = make_mesh({"data": min(4, len(jax.devices()))})
    samples, info = sample_chains_sharded(
        logp, init, jax.random.PRNGKey(4), mesh, method="hmc",
        num_samples=200, num_warmup=150,
    )
    assert samples.shape[0] == mesh.shape["data"]
    # chains agree on the posterior mean of b's slope
    lo, hi, _ = layout.slices["b"]
    slopes = np.asarray(samples[:, :, lo + 1].mean(axis=1))
    assert slopes.std() < 0.1
