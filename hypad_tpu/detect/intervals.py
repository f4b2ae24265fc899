"""Anomalous-interval extraction — the tiny host epilogue of the detector.

Behavior spec: reference ``find_anomalies`` chain
(utils/anomaly_detection_utils.py:1363-1472): sliding threshold windows over
the error series; per window fixed (mean + 4 sigma, :1098-1114) or dynamic
(z-cost minimization via Nelder-Mead over z in (0,10), :1023-1095) threshold;
above-threshold run extraction with padding (:1117-1166); max-error ranking
(:1169-1200); percent-separation pruning (:1203-1237); scoring
(max-thr)/(mean+std) (:1240-1269); weighted-average merging (:1272-1313);
finally positions are mapped to timestamps through the index.

This stage is pure O(T) array logic on a few-thousand-element series — the
profile says host numpy (<1 ms); kept exact rather than devicified
(SURVEY.md §7 step 6).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import fmin


# ---------------------------------------------------------------------------
# thresholds
# ---------------------------------------------------------------------------

def fixed_threshold(errors, k=4):
    return errors.mean() + k * errors.std()


def _deltas(errors, epsilon, mean, std):
    below = errors[errors <= epsilon]
    if not len(below):
        return 0, 0
    return mean - below.mean(), std - below.std()


def _count_above(errors, epsilon):
    above = errors > epsilon
    total_above = int(above.sum())
    # runs: positions where above turns on
    change = np.diff(np.concatenate([[False], above]).astype(int)) == 1
    return total_above, int(change.sum())


def z_cost(z, errors, mean, std):
    epsilon = mean + z * std
    delta_mean, delta_std = _deltas(errors, epsilon, mean, std)
    above, consecutive = _count_above(errors, epsilon)
    numerator = -(delta_mean / mean + delta_std / std)
    denominator = above + consecutive**2
    if denominator == 0:
        return np.inf
    return numerator / denominator


def find_threshold(errors, z_range=(0, 10)):
    mean = errors.mean()
    std = errors.std()
    min_z, max_z = z_range
    best_z = min_z
    best_cost = np.inf
    for z in range(min_z, max_z):
        best = fmin(z_cost, z, args=(errors, mean, std), full_output=True,
                    disp=False)
        z_opt, cost = best[0:2]
        if cost < best_cost:
            best_z = z_opt[0]
            # NOTE: the reference never updates best_cost (bug preserved:
            # utils/anomaly_detection_utils.py:1089-1093 keeps the LAST z
            # whose cost beats inf, i.e. effectively the last finite one).
    return mean + best_z * std


# ---------------------------------------------------------------------------
# sequences
# ---------------------------------------------------------------------------

def find_sequences(errors, epsilon, anomaly_padding):
    above = errors > epsilon
    idx = np.flatnonzero(above)
    # pad each above-threshold point by +-anomaly_padding: union of ranges
    # via a difference array + running sum — O(n + k) instead of the
    # reference's O(k * padding) per-point slice assigns (:1117-1166)
    n = len(above)
    delta = np.zeros(n + 1, dtype=np.int64)
    np.add.at(delta, np.maximum(idx - anomaly_padding, 0), 1)
    np.add.at(delta, np.minimum(idx + anomaly_padding + 1, n), -1)
    padded = np.cumsum(delta[:-1]) > 0
    if padded.all():
        max_below = 0.0
    else:
        max_below = float(errors[~padded].max())
    change = np.diff(np.concatenate([[False], padded]).astype(int))
    starts = np.flatnonzero(change == 1)
    ends = np.flatnonzero(change == -1) - 1
    if len(ends) == len(starts) - 1:
        ends = np.append(ends, len(padded) - 1)
    return np.array([starts, ends]).T, max_below


def get_max_errors(errors, sequences, max_below):
    rows = [(-1, -1, float(max_below))]
    for start, stop in sequences:
        rows.append((int(start), int(stop),
                     float(errors[start: stop + 1].max())))
    rows.sort(key=lambda r: -r[2])
    return rows  # list of (start, stop, max_error), descending by max_error


def prune_anomalies(max_errors, min_percent):
    """max_errors: descending (start, stop, max_error) incl. the sentinel
    non-anomalous row. Reference _prune_anomalies (:1203-1237).

    Pure-Python over the handful of runs a threshold window yields (the
    batched driver calls this per cell x window; numpy array construction
    was the measured hot spot). The reference's NaN/zero-div semantics are
    preserved exactly: 0/0 -> nan -> ``nan < min_percent`` is False (run
    kept as boundary), x/0 -> signed inf."""
    n = len(max_errors)
    if n < 2:
        return []
    last_index = -1
    for i in range(n - 2, -1, -1):
        me = max_errors[i][2]
        diff = me - max_errors[i + 1][2]
        if me == 0.0:
            # numpy scalar division reproduces the reference's inf/nan
            # (incl. the -0.0 sign convention) in this rare branch
            with np.errstate(invalid="ignore", divide="ignore"):
                increase = np.float64(diff) / np.float64(me)
        else:
            increase = diff / me
        if not increase < min_percent:
            last_index = i
            break
    return max_errors[: last_index + 1]


def compute_scores(pruned, errors, threshold, window_start):
    denominator = errors.mean() + errors.std()
    out = []
    for start, stop, max_error in pruned:
        score = (max_error - threshold) / denominator
        out.append([start + window_start, stop + window_start, score])
    return out


def _weighted_average(score, weights):
    """np.average(score, weights=weights). Two elements reduce without any
    associativity choice, so the plain Python form is bitwise-identical
    there (the most common merge chain); longer chains go through numpy,
    whose SIMD/pairwise reduction order already diverges from a sequential
    sum at n=3."""
    if len(score) == 2:
        return ((score[0] * weights[0] + score[1] * weights[1])
                / float(weights[0] + weights[1]))
    return np.average(score, weights=weights)


def merge_sequences(sequences):
    # Intermediate chain averages are overwritten by the next overlapping
    # extension and never escape, so each chain's weighted average is
    # computed ONCE when the chain closes — same outputs as the reference's
    # per-step recomputation (:1272-1313) at O(k) instead of O(k^2).
    if len(sequences) == 0:
        return np.array([])
    s = sorted(sequences, key=lambda e: e[0])
    merged = [s[0]]
    score = [s[0][2]]
    weights = [s[0][1] - s[0][0]]

    def close_chain():
        if len(score) > 1:
            prev = merged[-1]
            merged[-1] = (prev[0], prev[1],
                          _weighted_average(score, weights))

    for seq in s[1:]:
        prev = merged[-1]
        if seq[0] <= prev[1] + 1:
            score.append(seq[2])
            weights.append(seq[1] - seq[0])
            merged[-1] = (prev[0], max(prev[1], seq[1]), None)
        else:
            close_chain()
            score = [seq[2]]
            weights = [seq[1] - seq[0]]
            merged.append(seq)
    close_chain()
    return np.array(merged)


def _run_tail(window, seqs, max_below, threshold, denominator, min_percent,
              window_start):
    """Shared run-level tail (rank -> prune -> score) of one threshold
    window, used by both the per-cell and the batched drivers so they cannot
    diverge. ``denominator`` = window.mean() + window.std().

    A window with no above-threshold runs yields only the sentinel row,
    which prune_anomalies always drops (len < 2) — returning [] straight
    away is bitwise-identical and skips the tail for the common case."""
    if len(seqs) == 0:
        return []
    max_errors = get_max_errors(window, seqs, max_below)
    pruned = prune_anomalies(max_errors, min_percent)
    return [[start + window_start, stop + window_start,
             (max_error - threshold) / denominator]
            for start, stop, max_error in pruned]


def _find_window_sequences(window, z_range, anomaly_padding, min_percent,
                           window_start, use_fixed_threshold):
    threshold = (fixed_threshold(window) if use_fixed_threshold
                 else find_threshold(window, z_range))
    seqs, max_below = find_sequences(window, threshold, anomaly_padding)
    return _run_tail(window, seqs, max_below, threshold,
                     window.mean() + window.std(), min_percent, window_start)


def _window_geometry(n, window_size, window_size_portion, window_step_size,
                     window_step_size_portion):
    """Resolved (window_size, window_step_size) — the exact reference
    resolution order (:1444-1452), shared by the per-cell and batched
    drivers."""
    window_size = window_size or n
    if window_size_portion:
        window_size = int(np.ceil(n * window_size_portion))
    window_step_size = window_step_size or window_size
    if window_step_size_portion:
        window_step_size = int(np.ceil(window_size * window_step_size_portion))
    return window_size, window_step_size


def find_anomalies(errors, index, z_range=(0, 10), window_size=None,
                   window_size_portion=None, window_step_size=None,
                   window_step_size_portion=None, min_percent=0.1,
                   anomaly_padding=50, lower_threshold=False,
                   fixed_threshold=None):
    """Reference find_anomalies (:1363-1472): sliding threshold windows,
    sequence merge, position -> timestamp mapping."""
    errors = np.asarray(errors, dtype=np.float64)
    window_size, window_step_size = _window_geometry(
        len(errors), window_size, window_size_portion, window_step_size,
        window_step_size_portion)

    window_start = 0
    window_end = 0
    sequences = []
    while window_end < len(errors):
        window_end = window_start + window_size
        window = errors[window_start:window_end]
        sequences.extend(_find_window_sequences(
            window, z_range, anomaly_padding, min_percent, window_start,
            fixed_threshold))
        if lower_threshold:
            mean = window.mean()
            inverted = mean - (window - mean)
            sequences.extend(_find_window_sequences(
                inverted, z_range, anomaly_padding, min_percent, window_start,
                fixed_threshold))
        window_start += window_step_size

    merged = merge_sequences(sequences)
    anomalies = [[index[int(start)], index[int(stop)], score]
                 for start, stop, score in merged]
    return np.asarray(anomalies)


# ---------------------------------------------------------------------------
# batched driver: C cells' interval extraction in vectorized numpy
# ---------------------------------------------------------------------------

def _batch_window_sequences(W, anomaly_padding, min_percent, window_start,
                            sequences):
    """One threshold window for ALL C cells at once (fixed-threshold path).
    ``W``: (C, L) view of the score matrix. The per-cell statistics
    (mean/std/threshold), the above-threshold dilation, and max_below are
    vectorized across cells; only the tiny run-level tail (typically 0-3
    runs per cell) runs per cell, through the SAME ``_run_tail`` the
    per-cell driver uses. numpy reduces a C-contiguous (C, L) matrix over
    its last axis with the same pairwise summation as C separate 1-D
    reductions, so every statistic is bitwise equal to the per-cell path
    (asserted in tests/test_grid.py)."""
    C, L = W.shape
    mu = W.mean(axis=1)
    sd = W.std(axis=1)
    thresholds = mu + 4.0 * sd
    denominators = mu + sd
    above = W > thresholds[:, None]
    # padded[i] = any above within +-anomaly_padding — a sliding-window sum
    # over the boolean matrix (the batched twin of find_sequences'
    # difference-array union)
    cs = np.zeros((C, L + 1), np.int64)
    np.cumsum(above, axis=1, out=cs[:, 1:])
    ar = np.arange(L)
    hi = np.minimum(ar + anomaly_padding + 1, L)
    lo = np.maximum(ar - anomaly_padding, 0)
    padded = (cs[:, hi] - cs[:, lo]) > 0
    masked = np.where(padded, -np.inf, W)
    max_below = masked.max(axis=1)
    max_below[padded.all(axis=1)] = 0.0
    # all runs of all cells in two nonzero calls (row-major: per-cell runs
    # arrive in order; every run opened is closed, so starts align 1:1)
    d = np.diff(padded.astype(np.int8), axis=1, prepend=0, append=0)
    run_rows, run_starts = np.nonzero(d == 1)
    _, run_ends = np.nonzero(d == -1)  # exclusive; same rows as run_starts
    if len(run_rows) == 0:
        return  # no cell has a run in this window (the common case)
    run_starts = run_starts.tolist()
    run_stops = (run_ends - 1).tolist()
    bounds = np.searchsorted(run_rows, np.arange(C + 1)).tolist()
    for c in range(C):
        lo, hi = bounds[c], bounds[c + 1]
        if lo == hi:
            continue  # zero runs: _run_tail would return [] (bitwise)
        seqs = list(zip(run_starts[lo:hi], run_stops[lo:hi]))
        sequences[c].extend(_run_tail(
            W[c], seqs, float(max_below[c]), thresholds[c], denominators[c],
            min_percent, window_start))


def find_anomalies_batch(errors, index_list, window_size=None,
                         window_size_portion=None, window_step_size=None,
                         window_step_size_portion=None, min_percent=0.1,
                         anomaly_padding=50, lower_threshold=False,
                         fixed_threshold=None):
    """``find_anomalies`` over C cells sharing one score length, vectorized
    across the cell axis.

    No reference equivalent exists — the reference extracts intervals one
    scoring cell at a time (utils/anomaly_detection_utils.py:1363-1472 per
    ``anomaly_detection.py`` re-run). At benchmark-grid scale (hundreds of
    (signal x rec_error x combination) cells) the serial per-cell epilogue
    is minutes of 1-core host time while the device side is seconds; here
    the per-window statistics, thresholds, dilation and run extraction run
    as (C, L) numpy ops, bitwise equal per cell to ``find_anomalies``
    (tests/test_grid.py::test_find_anomalies_batch_bitwise).

    ``errors``: (C, T) matrix — one row per cell (rows of one grid/sweep
    share T by construction). ``index_list``: one (>=T,) timestamp index
    per cell (a length-C list/tuple of array-likes), or a single shared
    index. ``fixed_threshold`` defaults to None — dynamic thresholds, the
    same default as the serial ``find_anomalies`` — and dynamic cells fall
    back to the exact per-cell path (scipy.fmin per window is inherently
    serial); only the fixed-threshold path is vectorized across cells.
    Returns a list of C interval arrays.
    """
    E = np.ascontiguousarray(np.asarray(errors, dtype=np.float64))
    if E.ndim != 2:
        raise ValueError(f"errors must be (C, T), got shape {E.shape}")
    C, T = E.shape
    # per-cell indexes are a length-C list/tuple of ARRAY-LIKES; a plain
    # list of scalar timestamps (accepted by find_anomalies as the shared
    # index) must not be misread as C per-cell entries
    shared = not (isinstance(index_list, (list, tuple))
                  and len(index_list) == C
                  and all(np.ndim(e) >= 1 for e in index_list))
    if not fixed_threshold:
        return [find_anomalies(
                    E[c], index_list if shared else index_list[c],
                    window_size=window_size,
                    window_size_portion=window_size_portion,
                    window_step_size=window_step_size,
                    window_step_size_portion=window_step_size_portion,
                    min_percent=min_percent,
                    anomaly_padding=anomaly_padding,
                    lower_threshold=lower_threshold,
                    fixed_threshold=fixed_threshold)
                for c in range(C)]
    window_size, window_step_size = _window_geometry(
        T, window_size, window_size_portion, window_step_size,
        window_step_size_portion)

    sequences = [[] for _ in range(C)]
    window_start = 0
    window_end = 0
    while window_end < T:
        window_end = window_start + window_size
        W = E[:, window_start:window_end]
        _batch_window_sequences(W, anomaly_padding, min_percent,
                                window_start, sequences)
        if lower_threshold:
            mean = W.mean(axis=1)
            inverted = mean[:, None] - (W - mean[:, None])
            _batch_window_sequences(inverted, anomaly_padding, min_percent,
                                    window_start, sequences)
        window_start += window_step_size

    out = []
    for c in range(C):
        index = index_list if shared else index_list[c]
        merged = merge_sequences(sequences[c])
        out.append(np.asarray([[index[int(start)], index[int(stop)], score]
                               for start, stop, score in merged]))
    return out
