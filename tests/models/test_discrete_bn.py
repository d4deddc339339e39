import numpy as np
import pandas as pd
import pytest

from pybnesian_tpu.models import DiscreteBN
from data_gen import discrete_data


def test_discrete_bn_fit_logl_sample():
    df = discrete_data(3000)
    bn = DiscreteBN(["A", "B", "C", "D"], [("A", "B"), ("A", "C"), ("B", "C"), ("C", "D")])
    bn.fit(df)
    assert bn.fitted()
    ll = bn.logl(df)
    total = sum(np.asarray(bn.cpd(n).logl(df)) for n in "ABCD")
    np.testing.assert_allclose(ll, total)
    assert np.isclose(bn.slogl(df), np.nansum(ll))
    s = bn.sample(5000, seed=0).to_pandas()
    assert set(s.columns) == {"A", "B", "C", "D"}
    assert isinstance(s["A"].dtype, pd.CategoricalDtype)
    # marginal of A approx matches data
    pa_data = (df["A"] == "a1").mean()
    pa_sample = (s["A"] == "a1").mean()
    assert abs(pa_data - pa_sample) < 0.03


def test_discrete_bn_requires_categorical():
    df = pd.DataFrame({"A": [0.1, 0.2], "B": [1.0, 2.0]})
    bn = DiscreteBN(["A", "B"])
    with pytest.raises(ValueError):
        bn.fit(df)
