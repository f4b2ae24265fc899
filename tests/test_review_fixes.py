"""Regression tests for review findings (round 1 self-review)."""

import numpy as np
import pandas as pd
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.ops.rolling import rolling_mean_centered


def test_reconstruction_errors_smooth_false_returns_raw():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((300, 50))
    y_hat = y + 0.1 * rng.standard_normal((300, 50))
    raw, _ = sc.reconstruction_errors(y, y_hat, "point", smooth=False)
    smoothed, _ = sc.reconstruction_errors(y, y_hat, "point", smooth=True)
    # raw must be |true - pred|, not the rolling mean
    from hypad_tpu.ops.unroll import true_series, unroll_median
    import jax.numpy as jnp

    want = np.abs(np.asarray(true_series(jnp.asarray(y, jnp.float32)))
                  - np.asarray(unroll_median(jnp.asarray(y_hat, jnp.float32))))
    np.testing.assert_allclose(raw, want, rtol=1e-5, atol=1e-6)
    assert not np.allclose(raw, smoothed)


def test_rolling_mean_skips_nans_like_pandas():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(120)
    x[[5, 6, 50, 100]] = np.nan
    for w, mp in ((10, 5), (7, 3)):
        want = pd.Series(x).rolling(w, center=True, min_periods=mp).mean().values
        got = np.asarray(rolling_mean_centered(x.astype(np.float32), w, mp))
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-6, equal_nan=True)


def test_euclidean_invalid_combination_raises():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((150, 50))
    with pytest.raises(ValueError, match="Unknown combination"):
        sc.score_anomalies_euclidean(y, y, rng.standard_normal(150),
                                     comb="uncertainty")


def test_integer_smoothing_window_not_capped():
    """score_anomalies passes trunc(N*0.01) as an int, which the reference
    does NOT cap at 200; the float proportion path IS capped."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal((600, 20))
    y_hat = y + 0.05 * rng.standard_normal((600, 20))
    capped, _ = sc.reconstruction_errors(y, y_hat, "point",
                                         smoothing_window=0.5)  # ->200 cap
    uncapped, _ = sc.reconstruction_errors(y, y_hat, "point",
                                           smoothing_window=300)
    assert not np.allclose(capped, uncapped)
