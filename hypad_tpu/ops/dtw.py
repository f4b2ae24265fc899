"""Batched classic DTW over short sliding windows — anti-diagonal DP on device.

Behavior spec: reference ``_dtw_error`` (utils/anomaly_detection_utils.py:
815-863) computes ``pyts.metrics.dtw`` (classic method, squared point cost,
sqrt of the accumulated terminal cost) between 11-sample windows of the true
and predicted series, sliding by 1, after zero-padding 5 on each side; output
is 5 zeros + the T-11 distances + trailing zeros.

TPU-native: all T windows are materialized with stacked slices (no gather)
and the 11x11 dynamic program runs WAVEFRONT-FIRST: instead of scanning the
DP table row by row (110 sequential (T,)-element steps — the round-3
formulation, kept below as the equivalence oracle), the table is swept along
its 2L-1 = 21 anti-diagonals. Every cell on a diagonal depends only on the
two previous diagonals, so each step is one fused (L, T) vector op and the
whole batch DP is 21 unrolled elementwise steps that XLA fuses into a
handful of kernels. Per-cell arithmetic (cost + min(min(left, up), diag),
sequential row-0/column-0 accumulation) is identical to the row-scan form,
so results are bitwise equal (tests/test_dtw_diag.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dtw_batch_diag(tw, pw):
    """Terminal DTW distances for a batch of window pairs.

    tw, pw: (N, L) true/predicted windows. Returns (N,) sqrt distances.
    The DP runs over anti-diagonals d = i + j of the (L, L) accumulated-cost
    table, lane-major over the batch: state arrays are (L, N) with the big
    batch dimension minor so each of the 21 unrolled steps is one wide
    elementwise op.
    """
    n, length = tw.shape
    dtype = tw.dtype
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    x = tw.T                    # (L, N): x[k] = tw[:, k]
    y_rev = pw[:, ::-1].T       # (L, N): y_rev[k] = pw[:, L-1-k]
    big_row = jnp.full((1, n), big, dtype)
    prevprev = jnp.broadcast_to(big, (length, n))
    prev = prevprev
    for d in range(2 * length - 1):
        # cell (k, d-k): cost[k] = (x[k] - pw[:, d-k])**2. pw[:, d-k] is a
        # static roll of the reversed windows: y_rev[(L-1-d+k) mod L] — the
        # wrapped lanes land exactly on the invalid k, masked below.
        yd = jnp.roll(y_rev, d - (length - 1), axis=0)
        cost = (x - yd) ** 2
        k = jnp.arange(length)[:, None]
        valid = (k <= d) & (k >= d - (length - 1))
        if d == 0:
            cur = jnp.where(valid, cost, big)          # acc[0, 0] = cost[0, 0]
        else:
            up = jnp.concatenate([big_row, prev[:-1]], axis=0)        # (k-1, j)
            diag = jnp.concatenate([big_row, prevprev[:-1]], axis=0)  # (k-1, j-1)
            best = jnp.minimum(jnp.minimum(prev, up), diag)
            cur = jnp.where(valid, cost + best, big)
        prevprev, prev = prev, cur
    return jnp.sqrt(prev[length - 1])


def dtw_pair(x, y):
    """Classic DTW distance between two equal-length 1-D arrays with squared
    local cost and final sqrt (pyts.metrics.dtw defaults)."""
    return _dtw_batch_diag(x[None, :], y[None, :])[0]


def _dtw_pair_scan(x, y):
    """Row-scan DP (the round-3 formulation) — retained solely as the
    bitwise-equivalence oracle for ``_dtw_batch_diag``."""
    cost = (x[:, None] - y[None, :]) ** 2  # (L, L)
    big = jnp.asarray(jnp.finfo(cost.dtype).max / 4, cost.dtype)

    def row_step(prev_row, cost_row):
        def col_step(left, inp):
            c, up, diag = inp
            best = jnp.minimum(jnp.minimum(left, up), diag)
            acc = c + best
            return acc, acc

        diag_shift = jnp.concatenate([jnp.array([big], cost.dtype),
                                      prev_row[:-1]])
        _, row = jax.lax.scan(col_step, big, (cost_row, prev_row, diag_shift))
        return row, None

    row0 = jnp.cumsum(cost[0])
    last_row, _ = jax.lax.scan(row_step, row0, cost[1:])
    return jnp.sqrt(last_row[-1])


def _sliding(x, length):
    # length static slices + stack beats a (N, length) gather on TPU
    n = x.shape[0] - length + 1
    return jnp.stack([x[i:i + n] for i in range(length)], axis=1)


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
    sims = _dtw_batch_diag(tw, pw)
    out = jnp.zeros((T,), true.dtype)
    return out.at[half:half + n_windows].set(sims)
