"""Direct unit coverage of the shared multi-CKDE batched-logl helper
(factors/ckde.py batched_ckde_logl_many): mixed family widths, differing
test-row counts, differing training sizes — one launch must reproduce each
factor's own logl exactly."""

import numpy as np

from pybnesian_tpu import CKDE
from pybnesian_tpu.factors.ckde import batched_ckde_logl_many

from data_gen import normal_chain_data


def test_batched_many_mixed_entries():
    df1 = normal_chain_data(200, seed=1)
    df2 = normal_chain_data(350, seed=2)
    f1 = CKDE("a")                   # no evidence, 200 rows
    f1.fit(df1)
    f2 = CKDE("b", ["a"])            # 1 evidence, 350 rows
    f2.fit(df2)
    f3 = CKDE("d", ["a", "b", "c"])  # 3 evidence, 350 rows
    f3.fit(df2)

    t1 = normal_chain_data(37, seed=3)
    t2 = normal_chain_data(91, seed=4)
    entries = [
        (f1, t1[["a"]].to_numpy(np.float64)),
        (f2, t2[["b", "a"]].to_numpy(np.float64)),
        (f3, t1[["d", "a", "b", "c"]].to_numpy(np.float64)),
    ]
    outs = batched_ckde_logl_many(entries)
    np.testing.assert_allclose(outs[0], np.asarray(f1.logl(t1)),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(outs[1], np.asarray(f2.logl(t2)),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(outs[2], np.asarray(f3.logl(t1)),
                               rtol=1e-9, atol=1e-9)
