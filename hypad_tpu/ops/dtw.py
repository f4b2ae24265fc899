"""Batched classic DTW over short sliding windows — vmapped DP on device.

Behavior spec: reference ``_dtw_error`` (utils/anomaly_detection_utils.py:
815-863) computes ``pyts.metrics.dtw`` (classic method, squared point cost,
sqrt of the accumulated terminal cost) between 11-sample windows of the true
and predicted series, sliding by 1, after zero-padding 5 on each side; output
is 5 zeros + the T-11 distances + trailing zeros.

TPU-native: all T windows are materialized with one stride gather and the
11x11 dynamic program runs as a ``lax.scan`` over rows with an inner scan for
the row-wise running minimum, vmapped over the whole batch — no numba, no
Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dtw_pair(x, y):
    """Classic DTW distance between two equal-length 1-D arrays with squared
    local cost and final sqrt (pyts.metrics.dtw defaults)."""
    L = x.shape[0]
    cost = (x[:, None] - y[None, :]) ** 2  # (L, L)
    big = jnp.asarray(jnp.finfo(cost.dtype).max / 4, cost.dtype)

    def row_step(prev_row, cost_row):
        # prev_row: accumulated costs of row i-1; compute row i left->right
        def col_step(left, inp):
            c, up, diag = inp
            best = jnp.minimum(jnp.minimum(left, up), diag)
            acc = c + best
            return acc, acc

        diag_shift = jnp.concatenate([jnp.array([big], cost.dtype),
                                      prev_row[:-1]])
        # first column has no 'left'; seed with big
        _, row = jax.lax.scan(col_step, big, (cost_row, prev_row, diag_shift))
        return row, None

    # row 0: cumulative sum along columns (only 'left' moves)
    row0 = jnp.cumsum(cost[0])
    last_row, _ = jax.lax.scan(row_step, row0, cost[1:])
    return jnp.sqrt(last_row[-1])


def _sliding(x, length):
    idx = jnp.arange(x.shape[0] - length + 1)[:, None] + jnp.arange(length)
    return x[idx]


def dtw_errors(true, pred, score_window=10):
    """Full reference ``_dtw_error`` pipeline. true/pred: (T,). Returns (T,)."""
    length = (score_window // 2) * 2 + 1          # 11
    half = length // 2                            # 5
    T = true.shape[0]
    tp = jnp.pad(true, (half, half))
    pp = jnp.pad(pred, (half, half))
    n_windows = T - length                        # reference: while i < T - 11
    tw = _sliding(tp, length)[:n_windows]
    pw = _sliding(pp, length)[:n_windows]
    sims = jax.vmap(dtw_pair)(tw, pw)
    out = jnp.zeros((T,), true.dtype)
    return out.at[half:half + n_windows].set(sims)
