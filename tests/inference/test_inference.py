import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pybnesian_tpu.inference import (
    advi,
    hmc,
    make_logdensity,
    nuts,
    sample_chains,
    smc,
)
from pybnesian_tpu.models import GaussianNetwork
from data_gen import normal_chain_data


def _std_normal(theta):
    return -0.5 * jnp.sum(theta**2)


def test_hmc_standard_normal_moments():
    key = jax.random.PRNGKey(0)
    init = jnp.zeros(3)
    samples, info = hmc(
        _std_normal, init, key, num_samples=2000, num_warmup=500
    )
    assert float(info["accept_rate"]) > 0.5
    assert np.abs(np.asarray(samples.mean(0))).max() < 0.15
    assert np.abs(np.asarray(samples.std(0)) - 1.0).max() < 0.15


def test_nuts_standard_normal_moments():
    key = jax.random.PRNGKey(1)
    init = jnp.zeros(3)
    samples, info = nuts(
        _std_normal, init, key, num_samples=1500, num_warmup=500, max_depth=5
    )
    assert np.abs(np.asarray(samples.mean(0))).max() < 0.2
    assert np.abs(np.asarray(samples.std(0)) - 1.0).max() < 0.2


def test_correlated_gaussian_nuts():
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(theta):
        return -0.5 * theta @ prec @ theta

    samples, _ = nuts(
        logp, jnp.zeros(2), jax.random.PRNGKey(2), num_samples=3000,
        num_warmup=800, max_depth=6,
    )
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.35)


def test_bn_posterior_concentrates_on_mle():
    df = normal_chain_data(2000)
    model = GaussianNetwork(["a", "b", "c", "d"], [("a", "b"), ("b", "c"), ("c", "d")])
    logdensity, layout, init = make_logdensity(model, df, dtype=np.float64)
    # posterior mode ≈ MLE for 2000 rows
    samples, info = hmc(
        logdensity, init, jax.random.PRNGKey(3), num_samples=800,
        num_warmup=400, num_leapfrog=24,
    )
    post_mean = np.asarray(samples.mean(0))
    from pybnesian_tpu.learning.parameters import mle_lineargaussian

    lo, hi, _ = layout.slices["b"]
    params = mle_lineargaussian(df, "b", ["a"])
    np.testing.assert_allclose(post_mean[lo: lo + 2], params.beta, atol=0.05)
    assert abs(np.exp(post_mean[hi - 1]) - params.variance) < 0.1
    # posterior sd shrinks like 1/sqrt(n)
    assert np.asarray(samples.std(0))[lo] < 0.1


def test_sample_chains_multiple():
    samples, info = sample_chains(
        _std_normal, jnp.zeros(2), jax.random.PRNGKey(4), num_chains=4,
        method="hmc", num_samples=500, num_warmup=200,
    )
    assert samples.shape == (4, 500, 2)
    # chains agree (crude R-hat proxy)
    chain_means = np.asarray(samples.mean(1))
    assert np.abs(chain_means).max() < 0.3


def test_advi_gaussian():
    mu_true = jnp.asarray([1.0, -2.0])

    def logp(theta):
        return -0.5 * jnp.sum((theta - mu_true) ** 2 / 0.25)

    mu, sigma, elbo = advi(
        logp, jnp.zeros(2), jax.random.PRNGKey(5), num_steps=1500
    )
    np.testing.assert_allclose(np.asarray(mu), [1.0, -2.0], atol=0.1)
    np.testing.assert_allclose(np.asarray(sigma), 0.5, atol=0.15)
    assert elbo[-1] > elbo[0]


def test_smc_evidence_and_posterior():
    # prior N(0,1), likelihood N(theta; 1.0, 0.5^2) single obs per dim
    def logprior(theta):
        return -0.5 * jnp.sum(theta**2) - 0.5 * np.log(2 * np.pi)

    def loglik(theta):
        return -0.5 * jnp.sum((theta - 1.0) ** 2 / 0.25) - 0.5 * np.log(
            2 * np.pi * 0.25
        )

    key = jax.random.PRNGKey(6)
    particles0 = jax.random.normal(key, (512, 1))
    particles, log_w, log_z = smc(
        logprior, loglik, particles0, jax.random.PRNGKey(7), num_steps=15
    )
    w = np.exp(np.asarray(log_w - jax.nn.logsumexp(log_w)))
    post_mean = float((np.asarray(particles[:, 0]) * w).sum())
    # analytic posterior: precision 1 + 4 => mean = 4/5 * 1.0
    assert abs(post_mean - 0.8) < 0.1
    # analytic evidence: N(1.0; 0, 1 + 0.25)
    from scipy.stats import norm

    exact = norm.logpdf(1.0, 0.0, np.sqrt(1.25))
    assert abs(float(log_z) - exact) < 0.1


def test_sharded_chains_on_cpu_mesh():
    from pybnesian_tpu.inference import sample_chains_sharded
    from pybnesian_tpu.parallel import make_mesh

    mesh = make_mesh({"data": min(4, len(jax.devices()))})
    samples, info = sample_chains_sharded(
        _std_normal, jnp.zeros(2), jax.random.PRNGKey(8), mesh,
        chains_per_device=1, method="hmc", num_samples=300, num_warmup=150,
    )
    assert samples.shape[0] == mesh.shape["data"]
    assert np.abs(np.asarray(samples).mean()) < 0.3


def test_diagnostics_iid_chains():
    from pybnesian_tpu.inference import (
        effective_sample_size,
        potential_scale_reduction,
        summarize,
    )

    rng = np.random.default_rng(0)
    iid = rng.normal(0.0, 1.0, (4, 2000))
    rhat = potential_scale_reduction(iid)
    ess = effective_sample_size(iid)
    assert abs(rhat - 1.0) < 0.01
    # iid draws: ESS ~ total draws
    assert 0.75 * iid.size < ess < 1.35 * iid.size
    # AR(1) with rho=0.9: ESS ratio ~ (1-rho)/(1+rho) ~ 0.053
    rho = 0.9
    ar = np.zeros((4, 4000))
    ar[:, 0] = rng.normal(size=4)
    eps = rng.normal(size=(4, 4000))
    for t in range(1, 4000):
        ar[:, t] = rho * ar[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    ess_ar = effective_sample_size(ar)
    ratio = ess_ar / ar.size
    assert 0.02 < ratio < 0.12
    # non-converged chains (offset means) flagged by R-hat
    bad = iid.copy()
    bad[0] += 3.0
    assert potential_scale_reduction(bad) > 1.2
    s = summarize({"x": iid})
    assert set(s["x"]) == {"mean", "sd", "ess", "rhat"}


def test_nuts_chains_matches_vmapped_nuts():
    """The explicitly chain-batched sampler (whole doubling levels skipped
    once every chain U-turns) must reproduce vmap(nuts) — same per-chain
    RNG streams, same update rules, tiny f32 reduction-order differences
    only."""
    import jax
    import jax.numpy as jnp

    from pybnesian_tpu.inference.hmc import nuts, nuts_chains

    def logdensity(th):
        return -0.5 * jnp.sum(th**2) - 0.1 * jnp.sum(th**4)

    C, dim = 4, 3
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, C)
    inits = 0.1 * jax.random.normal(
        jax.random.fold_in(key, 1), (C, dim), jnp.float32
    )
    kw = dict(num_samples=50, num_warmup=30, max_depth=5)
    sb, ib = nuts_chains(logdensity, inits, keys, **kw)
    sv, iv = jax.vmap(
        lambda i, k: nuts(logdensity, i, k, **kw)
    )(inits, keys)
    np.testing.assert_allclose(
        np.asarray(ib["accept_rate"]), np.asarray(iv["accept_rate"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sb), np.asarray(sv), rtol=1e-3, atol=1e-4
    )
