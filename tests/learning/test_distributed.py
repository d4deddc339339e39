"""runtime.distributed bootstrap — single-process no-op semantics and
global-mesh construction (multi-host paths need real hosts; the env contract
and mesh layout are what is testable here)."""

import numpy as np

from pybnesian_tpu.runtime import distributed


def test_initialize_single_process_is_noop():
    assert distributed.initialize() is False
    assert distributed.initialize(num_processes=1) is False
    assert not distributed.is_distributed()


def test_process_summary():
    s = distributed.process_summary()
    assert s["process_count"] == 1
    assert s["process_index"] == 0
    assert s["global_devices"] >= 1
    assert not s["initialized_multiprocess"]


def test_global_mesh_axes():
    mesh = distributed.global_mesh(fam=2)
    assert mesh.shape["fam"] == 2
    assert mesh.shape["data"] * 2 == len(mesh.devices.ravel())


def test_global_mesh_runs_sharded_kernel():
    import jax.numpy as jnp

    from pybnesian_tpu.parallel import sharded_kde_slogl

    mesh = distributed.global_mesh()
    rng = np.random.default_rng(0)
    n = 8 * mesh.shape["data"]
    out = sharded_kde_slogl(
        mesh,
        jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32)),
        jnp.float32(-1.0),
    )
    assert np.isfinite(float(out))


def test_env_var_contract(monkeypatch):
    # PBN_NUM_PROCESSES=1 resolves to the single-process no-op
    monkeypatch.setenv("PBN_NUM_PROCESSES", "1")
    assert distributed.initialize() is False
