"""Checkpoint/resume subsystem (runtime/checkpoint.py + SaveModel-based
structure-search resume, SURVEY.md §5.4)."""

import os

import numpy as np
import pytest

import pybnesian_tpu as p
from pybnesian_tpu.runtime import load_pytree, nuts_checkpointed, save_pytree
from data_gen import normal_chain_data


def test_save_load_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {
        "a": jnp.arange(8, dtype=jnp.float32),
        "nested": {"b": jnp.ones((3, 2)), "n": jnp.asarray(5)},
    }
    path = str(tmp_path / "ck")
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(8))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]), np.ones((3, 2)))
    assert int(back["nested"]["n"]) == 5


def test_hc_resume_from_savemodel(tmp_path):
    """Interrupted hc (max_iters=1) + resume via start=saved model lands on
    the same structure as an uninterrupted run."""
    df = normal_chain_data(600, seed=3)

    full = p.hc(df, bn_type=p.GaussianNetworkType(), seed=0)

    folder = str(tmp_path / "iters")
    os.makedirs(folder, exist_ok=True)
    partial = p.hc(df, bn_type=p.GaussianNetworkType(), seed=0, max_iters=1,
                   callback=p.SaveModel(folder))
    # resume from the persisted iteration-1 model
    saved = sorted(os.listdir(folder))
    assert saved, "SaveModel wrote nothing"
    restored = p.load(os.path.join(folder, saved[-1]))
    assert restored.num_arcs() == partial.num_arcs()
    resumed = p.hc(df, bn_type=p.GaussianNetworkType(), seed=0,
                   start=restored)
    assert set(resumed.arcs()) == set(full.arcs())


def test_nuts_checkpointed_resumes(tmp_path):
    """A preempted checkpointed NUTS run continues from the last block and
    produces the same number of samples; posterior mean is sane."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 1.0, 500)

    def logp(theta):
        return -0.5 * jnp.sum((x - theta[0]) ** 2) - 0.5 * theta[0] ** 2 / 100.0

    init = jnp.zeros(1)
    ckdir = str(tmp_path / "nuts")

    # "preempted" run: only the warmup block gets written
    samples1, _ = nuts_checkpointed(
        logp, init, jax.random.PRNGKey(0), ckdir,
        num_samples=60, block_size=60, num_warmup=100, max_depth=5,
    )
    assert samples1.shape[0] == 60

    # resume with a larger target: must reuse the stored state (no warmup)
    samples2, info = nuts_checkpointed(
        logp, init, jax.random.PRNGKey(0), ckdir,
        num_samples=180, block_size=60, num_warmup=100, max_depth=5,
    )
    assert samples2.shape[0] == 180
    # first block identical to the preempted run's output
    np.testing.assert_allclose(
        np.asarray(samples2[:60]), np.asarray(samples1), rtol=1e-6
    )
    post = float(np.mean(np.asarray(samples2[60:, 0])))
    assert abs(post - x.mean()) < 0.2
    # stored state survives
    state = load_pytree(os.path.join(ckdir, "state"))
    assert int(state["blocks_done"]) == 3
