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


def rolling_mean_centered(x, window, min_periods=None):
    """pd.Series(x).rolling(window, center=True, min_periods).mean().

    NaN inputs are skipped like pandas (mean over the non-NaN observations;
    NaN output only where the non-NaN count < min_periods). Delegates to
    the ragged implementation with n = len(x) (all-valid): ONE definition
    of the empirically-verified pandas window semantics serves both the
    per-signal and the fleet path."""
    if min_periods is None:
        min_periods = window
    return rolling_mean_centered_ragged(x, window, x.shape[0], min_periods)


def rolling_trapz_centered(x, window, min_periods=None):
    """pd rolling(...).apply(integrate.trapz): unit-spacing trapezoid of each
    (possibly clipped) window = sum - (first + last)/2
    (reference _area_error, utils/anomaly_detection_utils.py:799-808).
    Delegates to the ragged implementation with n = len(x)."""
    if min_periods is None:
        min_periods = window
    return rolling_trapz_centered_ragged(x, window, x.shape[0], min_periods)


def zscore(x):
    """scipy.stats.zscore (ddof=0). NaN-free input expected."""
    return (x - jnp.mean(x)) / jnp.std(x)


# ---------------------------------------------------------------------------
# ragged variants: fixed (padded) shapes with a TRACED valid length.
#
# These exist for the fleet detector (detect/scorer.detect_scores_fleet): a
# whole signal family is padded to one (S, N, W) shape and vmapped, so per-
# signal lengths and smoothing windows arrive as traced scalars instead of
# static Python ints. For entries < n they compute exactly what the static
# functions compute on the length-n prefix; entries >= n are unspecified
# (callers slice them off on host). Equality with the static path is
# asserted in tests/test_fleet_detect.py.
# ---------------------------------------------------------------------------

def _window_bounds_ragged(size, window, n):
    """[start, end) of the pandas centered window, clipped to a TRACED valid
    length n (<= size, the padded static length)."""
    i = jnp.arange(size)
    start = jnp.clip(i - window // 2, 0, n)
    end = jnp.clip(i - window // 2 + window, 0, n)
    return start, end


def rolling_mean_centered_ragged(x, window, n, min_periods):
    """``rolling_mean_centered`` over the length-n prefix of padded x.
    ``window``/``n``/``min_periods`` may be traced scalars."""
    size = x.shape[0]
    valid = jnp.arange(size) < n
    finite = jnp.isfinite(x) & valid
    filled = jnp.where(finite, x, 0.0)
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(filled)])
    ccnt = jnp.concatenate([
        jnp.zeros((1,), x.dtype), jnp.cumsum(finite.astype(x.dtype))])
    start, end = _window_bounds_ragged(size, window, n)
    sums = csum[end] - csum[start]
    cnt = ccnt[end] - ccnt[start]
    mean = sums / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt >= min_periods, mean, jnp.nan)


def rolling_trapz_centered_ragged(x, window, n, min_periods):
    """``rolling_trapz_centered`` over the length-n prefix of padded x."""
    size = x.shape[0]
    valid = jnp.arange(size) < n
    xz = jnp.where(valid, x, 0.0)
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(xz)])
    start, end = _window_bounds_ragged(size, window, n)
    sums = csum[end] - csum[start]
    first = xz[jnp.clip(start, 0, size - 1)]
    last = xz[jnp.clip(end - 1, 0, size - 1)]
    cnt = (end - start).astype(x.dtype)
    trapz = sums - 0.5 * (first + last)
    return jnp.where(cnt >= min_periods, trapz, jnp.nan)


def zscore_masked(x, mask):
    """``zscore`` computed over the masked entries only (ddof=0); unmasked
    positions still receive (x - mean) / std of the masked population."""
    cnt = jnp.maximum(jnp.sum(mask), 1).astype(x.dtype)
    xz = jnp.where(mask, x, 0.0)
    mean = jnp.sum(xz) / cnt
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / cnt
    return (x - mean) / jnp.sqrt(var)


def masked_quantile(x, mask, q):
    """``jnp.quantile`` (linear interpolation) over the masked entries of a
    padded vector with a traced valid count."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    s = jnp.sort(jnp.where(mask, x, big))
    m = jnp.sum(mask)
    pos = q * jnp.maximum(m - 1, 0).astype(x.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(x.dtype)
    return s[lo] * (1.0 - frac) + s[hi] * frac
