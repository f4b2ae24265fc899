"""Direct unit tests for the ragged (traced-valid-length) score ops that
power the fleet detector (ops/rolling.py, ops/unroll.py).

Contract under test: for a padded input whose first ``n`` entries are real,
each ragged op must equal its static counterpart applied to the length-``n``
prefix, at every position < n (positions >= n are unspecified — callers
slice them off). The fleet-vs-per-signal equality in test_fleet_detect.py
covers the composition; these pin each primitive so a regression is
attributed to the right op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.ops import rolling as ro
from hypad_tpu.ops import unroll as ur

SIZE = 64


def _padded(n, seed=0, size=SIZE):
    rng = np.random.default_rng(seed)
    x = np.full((size,), 7.7, np.float32)  # pad garbage, never read
    x[:n] = rng.standard_normal(n).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(x[:n])


@pytest.mark.parametrize("n", [5, 37, SIZE])
@pytest.mark.parametrize("window", [1, 4, 9])
def test_rolling_mean_centered_ragged(n, window):
    x, prefix = _padded(n)
    mp = max(window // 2, 1)
    want = ro.rolling_mean_centered(prefix, window, mp)
    got = jax.jit(ro.rolling_mean_centered_ragged)(
        x, jnp.asarray(window), jnp.asarray(n), jnp.asarray(mp))
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n", [12, 41, SIZE])
@pytest.mark.parametrize("window", [2, 10])
def test_rolling_trapz_centered_ragged(n, window):
    x, prefix = _padded(n, seed=1)
    mp = window // 2
    want = ro.rolling_trapz_centered(prefix, window, mp)
    got = jax.jit(ro.rolling_trapz_centered_ragged)(
        x, jnp.asarray(window), jnp.asarray(n), jnp.asarray(mp))
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [3, 29, SIZE])
def test_zscore_masked(n):
    x, prefix = _padded(n, seed=2)
    want = ro.zscore(prefix)
    mask = jnp.arange(SIZE) < n
    got = jax.jit(ro.zscore_masked)(x, mask)
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [2, 17, SIZE])
@pytest.mark.parametrize("q", [0.25, 0.5, 0.75])
def test_masked_quantile(n, q):
    x, prefix = _padded(n, seed=3)
    want = jnp.quantile(prefix, q)
    mask = jnp.arange(SIZE) < n
    got = jax.jit(ro.masked_quantile, static_argnums=2)(x, mask, q)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


@pytest.mark.parametrize("n_real", [1, 7, 16])
def test_true_series_ragged(n_real):
    W = 5
    rng = np.random.default_rng(4)
    y = rng.standard_normal((16, W)).astype(np.float32)
    want = ur.true_series(jnp.asarray(y[:n_real]))
    got = jax.jit(ur.true_series_ragged)(jnp.asarray(y),
                                         jnp.asarray(n_real))
    t = n_real + W - 1
    np.testing.assert_array_equal(np.asarray(got)[:t], np.asarray(want))


@pytest.mark.parametrize("n_real", [1, 9, 16])
def test_unroll_median_ragged(n_real):
    W = 6
    rng = np.random.default_rng(5)
    y = rng.standard_normal((16, W)).astype(np.float32)
    want = ur.unroll_median(jnp.asarray(y[:n_real]))
    got = jax.jit(ur.unroll_median)(jnp.asarray(y), jnp.asarray(n_real))
    t = n_real + W - 1
    np.testing.assert_array_equal(np.asarray(got)[:t], np.asarray(want))
