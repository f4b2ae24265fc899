"""Rolling-window statistics with exact pandas semantics, vectorized.

Behavior spec: every smoothing step of the reference detector goes through
``pd.Series(x).rolling(window, center=True, min_periods=window//2)`` —
critic-score smoothing (utils/anomaly_detection_utils.py:326-331), error
smoothing (:952-961), area error via rolling trapz (:799-808). Pandas'
centered window for label i covers ``[i - w//2, i - w//2 + w - 1]`` clipped to
the array (empirically verified; right-heavy for even w), yielding NaN when
fewer than ``min_periods`` samples exist.

Implemented as cumulative-sum differences — O(T) regardless of window size.
zscore matches scipy.stats.zscore (ddof=0, :523,:542).
"""

from __future__ import annotations

import jax.numpy as jnp


def _window_bounds(n, window):
    """Per-index [start, end) of the pandas centered window, clipped."""
    i = jnp.arange(n)
    start = jnp.clip(i - window // 2, 0, n)
    end = jnp.clip(i - window // 2 + window, 0, n)
    return start, end


def rolling_mean_centered(x, window, min_periods=None):
    """pd.Series(x).rolling(window, center=True, min_periods).mean().

    NaN inputs are skipped like pandas (mean over the non-NaN observations;
    NaN output only where the non-NaN count < min_periods).
    """
    if min_periods is None:
        min_periods = window
    n = x.shape[0]
    finite = jnp.isfinite(x)
    filled = jnp.where(finite, x, 0.0)
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(filled)])
    ccnt = jnp.concatenate([
        jnp.zeros((1,), x.dtype), jnp.cumsum(finite.astype(x.dtype))])
    start, end = _window_bounds(n, window)
    sums = csum[end] - csum[start]
    cnt = ccnt[end] - ccnt[start]
    mean = sums / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt >= min_periods, mean, jnp.nan)


def rolling_trapz_centered(x, window, min_periods=None):
    """pd rolling(...).apply(integrate.trapz): unit-spacing trapezoid of each
    (possibly clipped) window = sum - (first + last)/2
    (reference _area_error, utils/anomaly_detection_utils.py:799-808)."""
    if min_periods is None:
        min_periods = window
    n = x.shape[0]
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(x)])
    start, end = _window_bounds(n, window)
    sums = csum[end] - csum[start]
    first = x[start]
    last = x[jnp.maximum(end - 1, 0)]
    cnt = (end - start).astype(x.dtype)
    trapz = sums - 0.5 * (first + last)
    return jnp.where(cnt >= min_periods, trapz, jnp.nan)


def zscore(x):
    """scipy.stats.zscore (ddof=0). NaN-free input expected."""
    return (x - jnp.mean(x)) / jnp.std(x)
