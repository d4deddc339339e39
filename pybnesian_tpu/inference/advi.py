"""ADVI: automatic differentiation variational inference.

Net-new subsystem: mean-field Gaussian posterior over the flat parameter
vector, ELBO maximised with the reparameterisation trick and Adam (optax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["advi"]


def advi(logdensity, init, key, num_steps: int = 2000, num_mc: int = 8,
         learning_rate: float = 0.02):
    """Returns (mu, sigma, elbo_trace): the fitted mean-field posterior and
    the ELBO trajectory."""
    import optax

    dim = init.shape[0]
    params = {
        "mu": init,
        "log_sigma": jnp.full((dim,), -2.0, init.dtype),
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def neg_elbo(params, key):
        sigma = jnp.exp(params["log_sigma"])
        eps = jax.random.normal(key, (num_mc, dim), init.dtype)
        thetas = params["mu"][None, :] + eps * sigma[None, :]
        logps = jax.vmap(logdensity)(thetas)
        entropy = jnp.sum(params["log_sigma"]) + 0.5 * dim * (
            1.0 + jnp.log(2 * jnp.pi)
        )
        return -(jnp.mean(logps) + entropy)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def scan_step(carry, key):
        params, opt_state = carry
        params, opt_state, loss = step(params, opt_state, key)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbo_trace = jax.lax.scan(
        scan_step, (params, opt_state), keys
    )
    return params["mu"], jnp.exp(params["log_sigma"]), elbo_trace
