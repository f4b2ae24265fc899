"""Anti-diagonal DTW == round-3 row-scan DTW, bitwise.

The wavefront reformulation (ops/dtw.py:_dtw_batch_diag) performs the exact
per-cell arithmetic of the row-scan DP (cost + min(min(left, up), diag),
sequential boundary accumulation), so outputs must be bit-identical — not
merely close — across dtypes and window contents, including the zero-padded
boundary windows the full dtw_errors pipeline produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.ops.dtw import _dtw_batch_diag, _dtw_pair_scan, dtw_errors


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_batch_diag_bitwise_equals_row_scan(dtype):
    rng = np.random.default_rng(7)
    tw = rng.standard_normal((64, 11)).astype(dtype)
    pw = (tw + 0.3 * rng.standard_normal((64, 11))).astype(dtype)
    # include fully-zero and half-zero windows (the dtw_errors pad boundary)
    tw[0] = 0.0
    pw[0] = 0.0
    tw[1, :5] = 0.0
    pw[1, 6:] = 0.0
    got = np.asarray(_dtw_batch_diag(jnp.asarray(tw), jnp.asarray(pw)))
    want = np.asarray(jax.vmap(_dtw_pair_scan)(jnp.asarray(tw),
                                               jnp.asarray(pw)))
    np.testing.assert_array_equal(got, want)


def test_dtw_errors_bitwise_equals_row_scan_pipeline():
    rng = np.random.default_rng(11)
    T = 500
    true = rng.standard_normal(T).astype(np.float32)
    pred = (true + 0.1 * rng.standard_normal(T)).astype(np.float32)

    got = np.asarray(dtw_errors(jnp.asarray(true), jnp.asarray(pred)))

    # round-3 pipeline: gather-based windows + vmapped row-scan DP
    half, length = 5, 11
    tp = jnp.pad(jnp.asarray(true), (half, half))
    pp = jnp.pad(jnp.asarray(pred), (half, half))
    idx = jnp.arange(T)[:, None] + jnp.arange(length)
    n_windows = T - length
    sims = jax.vmap(_dtw_pair_scan)(tp[idx][:n_windows], pp[idx][:n_windows])
    want = np.zeros((T,), np.float32)
    want[half:half + n_windows] = np.asarray(sims)

    np.testing.assert_array_equal(got, want)
