import numpy as np
import jax.numpy as jnp
from scipy.special import logsumexp

from pybnesian_tpu.ops.pallas_kde import pallas_kde_logl


def test_pallas_kernel_interpret_mode_matches_oracle():
    rng = np.random.default_rng(0)
    N, M, d = 256, 128, 3
    train = rng.normal(0, 2, (N, d)).astype(np.float32)
    test = rng.normal(0, 2, (M, d)).astype(np.float32)
    valid = np.ones(N, np.float32)
    valid[200:] = 0.0  # padded rows must be excluded
    out = pallas_kde_logl(
        jnp.asarray(train), jnp.asarray(valid), jnp.asarray(test),
        jnp.asarray(np.array([-1.5], np.float32)),
        block_m=64, block_n=128, interpret=True,
    )
    ref = logsumexp(
        -0.5 * ((test[:, None, :] - train[None, :200, :]) ** 2).sum(-1),
        axis=1,
    ) - 1.5
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
