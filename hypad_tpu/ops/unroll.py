"""Anti-diagonal unrolling of window-stacked predictions — batched gathers.

Behavior spec: the reference rebuilds a single time series from the (N, W)
matrix of overlapping window reconstructions by walking, for each of
``T = W + N - 1`` timesteps, the anti-diagonal ``y_hat[i - j, j]`` and taking
its median (reconstruction, ``utils/anomaly_detection_utils.py:915-938``) or
its KDE-argmax (critic scores, ``:372-400``). The reference does this with a
Python double loop (O(T*W) list appends + a KDE fit per timestep) — the
scoring hot spot called out in SURVEY §3.4. Here the whole anti-diagonal
structure is materialized as ONE (T, W) gather + mask, and the reductions are
masked vector ops, so the entire unroll runs on-device in microseconds.
"""

from __future__ import annotations

import jax.numpy as jnp


def antidiagonal_gather(y_hat, n_real=None):
    """(N, W) window-stacked values -> (T, W) anti-diagonal matrix + mask.

    Row i holds the values predicted for timestep i: ``y_hat[i - j, j]`` for
    the valid j's, in ascending-j order (matching the reference's loop order);
    invalid entries are 0 with mask False. T = N + W - 1.

    Built GATHER-FREE with the pad-reshape skew trick: padding each row of
    y_hat.T by W zeros and re-viewing the flat buffer at width T shifts row
    j right by exactly j, so S[j, t] = y_hat[t - j, j] (out-of-range t-j
    lands in the zero padding); the anti-diagonal matrix is S.T. TPU
    gathers are slow — the round-3 on-chip probe measured the old
    ``y_hat[clip(i-j), j]`` 2-D gather at ~20 ms for 20k x 100 vs <1 ms for
    this formulation (PARITY.md); outputs are bitwise-identical.

    ``n_real``: optional traced count of REAL windows (< N; the rest are
    fleet padding, detect_scores_fleet) — entries drawn from pad windows
    are masked out, so every masked consumer sees exactly the length-n_real
    anti-diagonal structure.
    """
    N, W = y_hat.shape
    T = N + W - 1
    P = jnp.pad(y_hat.T, ((0, 0), (0, W)))       # (W, N + W)
    vals = P.reshape(-1)[:-W].reshape(W, T).T    # (T, W), zeros off-band
    i = jnp.arange(T)[:, None]        # (T, 1)
    j = jnp.arange(W)[None, :]        # (1, W)
    n = i - j                          # window index
    mask = (n >= 0) & (n < (N if n_real is None else n_real))
    return vals, mask


def masked_median(vals, mask):
    """Per-row median over the masked entries (np.median semantics: mean of
    the two middle order statistics for even counts)."""
    big = jnp.asarray(jnp.finfo(vals.dtype).max, vals.dtype)
    filled = jnp.where(mask, vals, big)
    s = jnp.sort(filled, axis=-1)
    cnt = jnp.sum(mask, axis=-1)
    lo = jnp.take_along_axis(s, ((cnt - 1) // 2)[:, None], axis=-1)[:, 0]
    hi = jnp.take_along_axis(s, (cnt // 2)[:, None], axis=-1)[:, 0]
    return 0.5 * (lo + hi)


def unroll_median(y_hat, n_real=None):
    """Reference ``reconstruction_errors`` prediction unroll
    (utils/anomaly_detection_utils.py:915-938): per-timestep median of all
    overlapping window predictions. (N, W) -> (T,). ``n_real``: see
    ``antidiagonal_gather``."""
    vals, mask = antidiagonal_gather(y_hat, n_real=n_real)
    return masked_median(vals, mask)


def true_series(y):
    """Reference 'true' reassembly (utils/anomaly_detection_utils.py:908-910):
    first element of every window plus the tail of the last window.
    (N, W) -> (T,)."""
    return jnp.concatenate([y[:, 0], y[-1, 1:]])


def true_series_ragged(y, n_real):
    """``true_series`` over the first ``n_real`` (traced) rows of padded y:
    positions [0, n_real) take window starts, [n_real, n_real + W - 1) the
    tail of window n_real - 1; later entries are unspecified (fleet padding,
    sliced off on host)."""
    import jax

    W = y.shape[1]
    first = jnp.pad(y[:, 0], (0, W - 1))                      # (T,)
    last = jax.lax.dynamic_slice_in_dim(
        y, jnp.maximum(n_real - 1, 0), 1, axis=0)[0]          # (W,)
    return jax.lax.dynamic_update_slice(first, last[1:], (n_real,))
