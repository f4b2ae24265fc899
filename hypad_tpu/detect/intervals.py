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
    non-anomalous row. Reference _prune_anomalies (:1203-1237)."""
    e = np.array([r[2] for r in max_errors])
    if len(e) < 2:
        return np.empty((0, 3))
    max_error = e[:-1]
    next_error = e[1:]
    # preserve reference NaN/zero-div semantics: 0/0 -> nan -> comparison False
    with np.errstate(invalid="ignore", divide="ignore"):
        increase = (max_error - next_error) / max_error
    too_small = increase < min_percent
    if too_small.all():
        last_index = -1
    else:
        last_index = int(np.flatnonzero(~too_small)[-1])
    kept = max_errors[: last_index + 1]
    return np.array([[r[0], r[1], r[2]] for r in kept]).reshape(-1, 3)


def compute_scores(pruned, errors, threshold, window_start):
    denominator = errors.mean() + errors.std()
    out = []
    for start, stop, max_error in pruned:
        score = (max_error - threshold) / denominator
        out.append([start + window_start, stop + window_start, score])
    return out


def merge_sequences(sequences):
    if len(sequences) == 0:
        return np.array([])
    s = sorted(sequences, key=lambda e: e[0])
    merged = [s[0]]
    score = [s[0][2]]
    weights = [s[0][1] - s[0][0]]
    for seq in s[1:]:
        prev = merged[-1]
        if seq[0] <= prev[1] + 1:
            score.append(seq[2])
            weights.append(seq[1] - seq[0])
            weighted = np.average(score, weights=weights)
            merged[-1] = (prev[0], max(prev[1], seq[1]), weighted)
        else:
            score = [seq[2]]
            weights = [seq[1] - seq[0]]
            merged.append(seq)
    return np.array(merged)


def _find_window_sequences(window, z_range, anomaly_padding, min_percent,
                           window_start, use_fixed_threshold):
    threshold = (fixed_threshold(window) if use_fixed_threshold
                 else find_threshold(window, z_range))
    seqs, max_below = find_sequences(window, threshold, anomaly_padding)
    max_errors = get_max_errors(window, seqs, max_below)
    pruned = prune_anomalies(max_errors, min_percent)
    return compute_scores(pruned, window, threshold, window_start)


def find_anomalies(errors, index, z_range=(0, 10), window_size=None,
                   window_size_portion=None, window_step_size=None,
                   window_step_size_portion=None, min_percent=0.1,
                   anomaly_padding=50, lower_threshold=False,
                   fixed_threshold=None):
    """Reference find_anomalies (:1363-1472): sliding threshold windows,
    sequence merge, position -> timestamp mapping."""
    errors = np.asarray(errors, dtype=np.float64)
    window_size = window_size or len(errors)
    if window_size_portion:
        window_size = int(np.ceil(len(errors) * window_size_portion))
    window_step_size = window_step_size or window_size
    if window_step_size_portion:
        window_step_size = int(np.ceil(window_size * window_step_size_portion))

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
