"""Native C++ preprocessing core: build, parity vs the numpy pipeline, and
use through load_signal_dataset."""

import os

import numpy as np
import pytest

from hypad_tpu.data import native
from hypad_tpu.data import pipeline as dp

NAB_CSV = "/root/reference/data/Twitter_volume_AAPL.csv"


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_native_matches_numpy_on_nab(lib):
    got = dp.load_signal_dataset(NAB_CSV, interval=21600, engine="native")
    want = dp.load_signal_dataset(NAB_CSV, interval=21600, engine="numpy")
    np.testing.assert_array_equal(got.X, want.X)
    np.testing.assert_array_equal(got.y, want.y)
    np.testing.assert_allclose(got.X_index, want.X_index)
    np.testing.assert_allclose(got.index, want.index)


def test_native_matches_numpy_random(lib):
    rng = np.random.default_rng(0)
    n = 5000
    ts = np.sort(rng.uniform(0, 1e6, n))
    vs = rng.standard_normal(n)
    vs[rng.random(n) < 0.02] = np.nan  # missing values
    res = native.prepare_univariate(ts, vs, 300.0, window_size=50)
    assert res is not None
    windows, targets, x_idx, y_idx, index = res

    agg, idx = dp.time_segments_aggregate(vs, ts, 300.0)
    X = dp.minmax_scale(dp.impute_mean(agg))
    wX, wy, wxi, wyi = dp.rolling_windows(X, idx, window_size=50)
    np.testing.assert_array_equal(windows, wX.astype(np.float32))
    np.testing.assert_array_equal(targets, wy.astype(np.float32))
    np.testing.assert_allclose(x_idx, wxi)
    np.testing.assert_allclose(index, idx)


def test_native_too_short_returns_none(lib):
    ts = np.arange(10.0)
    vs = np.ones(10)
    assert native.prepare_univariate(ts, vs, 1.0, window_size=100) is None


def test_engine_native_raises_when_too_short(lib, tmp_path):
    import pandas as pd

    csv = tmp_path / "tiny.csv"
    pd.DataFrame({"timestamp": np.arange(10), "value": np.ones(10)}).to_csv(
        csv, index=False)
    with pytest.raises(RuntimeError):
        dp.load_signal_dataset(str(csv), interval=1, engine="native")
