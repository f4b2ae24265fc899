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
# batched dynamic thresholds: all (cell, window, z-start) fmin problems at
# once — a vectorized replica of scipy.optimize.fmin's Nelder-Mead for the
# 1-D z_cost minimization (reference :1023-1095), with O(log L) cost
# evaluations from per-window sorted prefix tables
# ---------------------------------------------------------------------------

class _WindowTables:
    """Per-window preprocessing that turns every z_cost evaluation into a
    few binary searches instead of an O(L) pass:

      * ``sorted_e`` + prefix sums of values/squares -> below-threshold
        count/mean/std at searchsorted position;
      * interval-stabbing pair arrays: a run STARTS at i iff
        e_{i-1} <= eps < e_i (boundary: e_0 > eps), so the run count is
        #(a_sorted <= eps) - #(b_sorted <= eps) over kept pairs a < b —
        each a plain searchsorted.

    Numerical note: below-subset mean/std come from prefix sums over the
    SORTED window rather than numpy's pairwise reduction over the original
    subset — values agree to ~1e-16 relative, NOT bitwise; the serial
    ``find_threshold`` stays the bitwise oracle and final-interval parity
    is asserted in tests (test_intervals_batch)."""

    def __init__(self, W):
        W = np.ascontiguousarray(W, np.float64)
        self.mean = W.mean(axis=1)
        self.std = W.std(axis=1)
        self.first = W[:, 0]
        s = np.sort(W, axis=1)                      # NaN sort to the end
        self.n_valid = (~np.isnan(W)).sum(axis=1)
        clean = np.where(np.isnan(s), 0.0, s)
        Wn, L = W.shape
        self.pre_sum = np.zeros((Wn, L + 1))
        np.cumsum(clean, axis=1, out=self.pre_sum[:, 1:])
        self.pre_sumsq = np.zeros((Wn, L + 1))
        np.cumsum(clean * clean, axis=1, out=self.pre_sumsq[:, 1:])
        a, b = W[:, :-1], W[:, 1:]
        keep = a < b                                 # NaN pairs drop out
        pad = np.full((Wn, 1), np.inf)
        # the three searched tables stacked into ONE row-sorted matrix so a
        # z_cost evaluation is a single 3P-problem binary search (separate
        # searches tripled the numpy call overhead, the measured frontier)
        self.tables = np.concatenate([
            s,
            np.concatenate([np.sort(np.where(keep, a, np.inf), axis=1),
                            pad], axis=1),
            np.concatenate([np.sort(np.where(keep, b, np.inf), axis=1),
                            pad], axis=1),
        ])
        self.Wn = Wn

    def z_cost(self, z, rows):
        """Vectorized reference z_cost (:1023-1062) for P problems: ``z``
        (P,) candidate z values, ``rows`` (P,) table-row indices."""
        mean, std = self.mean[rows], self.std[rows]
        P, Wn = len(rows), self.Wn
        with np.errstate(invalid="ignore", divide="ignore",
                         over="ignore"):
            eps = mean + z * std
            rows3 = np.concatenate([rows, rows + Wn, rows + 2 * Wn])
            pos3 = _vsearch_right(self.tables, rows3, np.tile(eps, 3))
            pos, ra, rb = pos3[:P], pos3[P:2 * P], pos3[2 * P:]
            cnt = pos.astype(np.float64)
            mean_b = self.pre_sum[rows, pos] / cnt
            var_b = self.pre_sumsq[rows, pos] / cnt - mean_b * mean_b
            std_b = np.sqrt(np.maximum(var_b, 0.0))
            has_below = pos > 0
            delta_mean = np.where(has_below, mean - mean_b, 0.0)
            delta_std = np.where(has_below, std - std_b, 0.0)
            above = self.n_valid[rows] - pos
            runs = ra - rb + (self.first[rows] > eps)
            numerator = -(delta_mean / mean + delta_std / std)
            denominator = above + runs * runs
            return np.where(denominator == 0, np.inf,
                            numerator / denominator)


def _vsearch_right(mat, rows, vals):
    """Per-row ``searchsorted(mat[rows[p]], vals[p], side='right')`` —
    a fixed-depth vectorized binary search (rows index a (Wn, L) matrix of
    row-sorted values; NaN/inf tails compare correctly)."""
    L = mat.shape[1]
    n = len(rows)
    lo = np.zeros(n, np.int64)
    hi = np.full(n, L, np.int64)
    flat = mat.ravel()
    base = rows * L
    for _ in range(int(np.ceil(np.log2(max(L, 2)))) + 1):
        open_ = lo < hi
        mid = (lo + hi) >> 1
        le = flat[base + np.minimum(mid, L - 1)] <= vals
        go = open_ & le
        lo = np.where(go, mid + 1, lo)
        hi = np.where(open_ & ~le, mid, hi)
    return lo


_NM_XATOL = 1e-4
_NM_FATOL = 1e-4
_NM_MAXITER = 200    # scipy fmin defaults for N=1: N * 200
_NM_MAXFUN = 200


def _fmin_z_batch(x0, tab, rows):
    """P simultaneous 1-D Nelder-Mead minimizations of z_cost — the exact
    scipy ``fmin`` algorithm (rho=1 chi=2 psi=0.5 sigma=0.5, 5% initial
    step / 0.00025 at zero, xatol=fatol=1e-4, maxiter=maxfun=200) run in
    lockstep across problems with masked branch updates. For N=1 scipy's
    ``fxr < fsim[-2]`` reflection-accept branch is unreachable
    (fsim[-2] IS fsim[0]), leaving expand/contract/shrink.

    Returns (x, fval) per problem — scipy's ``sim[0]`` and ``min(fsim)``.
    """
    sim0 = np.asarray(x0, np.float64).copy()
    sim1 = np.where(sim0 != 0.0, 1.05 * sim0, 0.00025)
    f0 = tab.z_cost(sim0, rows)
    f1 = tab.z_cost(sim1, rows)
    fcalls = np.full(len(sim0), 2, np.int64)

    def sort2():
        nonlocal sim0, sim1, f0, f1
        # np.argsort on 2 elements: swap iff f1 < f0, or f0 is NaN while
        # f1 is not (NaN sorts last)
        swap = (f1 < f0) | (np.isnan(f0) & ~np.isnan(f1))
        sim0, sim1 = (np.where(swap, sim1, sim0),
                      np.where(swap, sim0, sim1))
        f0, f1 = np.where(swap, f1, f0), np.where(swap, f0, f1)

    sort2()
    active = np.ones(len(sim0), bool)
    for _ in range(1, _NM_MAXITER):          # iterations start at 1
        with np.errstate(invalid="ignore"):
            conv = (np.abs(sim1 - sim0) <= _NM_XATOL) \
                & (np.abs(f0 - f1) <= _NM_FATOL)
        active &= ~conv & (fcalls < _NM_MAXFUN)
        act = np.flatnonzero(active)
        if not len(act):
            break
        s0, s1, g0, g1 = sim0[act], sim1[act], f0[act], f1[act]
        r = rows[act]
        xr = 2.0 * s0 - s1
        fxr = tab.z_cost(xr, r)
        calls = np.full(len(act), 2, np.int64)   # xr + exactly one more
        ns1, nf1 = s1.copy(), g1.copy()
        with np.errstate(invalid="ignore"):
            case1 = fxr < g0
        i1 = np.flatnonzero(case1)
        if len(i1):
            xe = 3.0 * s0[i1] - 2.0 * s1[i1]
            fxe = tab.z_cost(xe, r[i1])
            use_e = fxe < fxr[i1]
            ns1[i1] = np.where(use_e, xe, xr[i1])
            nf1[i1] = np.where(use_e, fxe, fxr[i1])
        rest = ~case1
        with np.errstate(invalid="ignore"):
            outside = rest & (fxr < g1)
        i3 = np.flatnonzero(outside)
        shrink = np.zeros(len(act), bool)
        if len(i3):
            xc = 1.5 * s0[i3] - 0.5 * s1[i3]
            fxc = tab.z_cost(xc, r[i3])
            ok = fxc <= fxr[i3]
            ns1[i3] = np.where(ok, xc, ns1[i3])
            nf1[i3] = np.where(ok, fxc, nf1[i3])
            shrink[i3] = ~ok
        i4 = np.flatnonzero(rest & ~outside)
        if len(i4):
            xcc = 0.5 * s0[i4] + 0.5 * s1[i4]
            fxcc = tab.z_cost(xcc, r[i4])
            ok = fxcc < g1[i4]
            ns1[i4] = np.where(ok, xcc, ns1[i4])
            nf1[i4] = np.where(ok, fxcc, nf1[i4])
            shrink[i4] = ~ok
        ish = np.flatnonzero(shrink)
        if len(ish):
            xs = s0[ish] + 0.5 * (ns1[ish] - s0[ish])
            ns1[ish] = xs
            nf1[ish] = tab.z_cost(xs, r[ish])
            calls[ish] += 1
        sim1[act], f1[act] = ns1, nf1
        fcalls[act] += calls
        sort2()
    with np.errstate(invalid="ignore"):
        fval = np.where(np.isnan(f0) | np.isnan(f1), np.nan,
                        np.minimum(f0, f1))
    return sim0, fval


def _find_thresholds_batch(windows, z_range=(0, 10)):
    """Dynamic thresholds for a stack of equal-length windows (Wn, L):
    the reference ``find_threshold`` semantics — fmin from every integer
    z start, keeping the LAST start whose minimized cost is finite (the
    preserved best_cost bug, see find_threshold above; falls back to
    ``mean + min_z * std`` when no start is finite) — for all windows and
    starts in one batched Nelder-Mead.

    The native C++ engine (native/thresholds.cpp) runs the same algorithm
    ~50x faster when the toolchain is available; it is bitwise-identical
    to this numpy path (same prefix-sum tables, same IEEE ops — asserted
    in tests/test_intervals_batch.py), which remains the fallback."""
    from hypad_tpu.data import native

    W = np.ascontiguousarray(windows, np.float64)
    out = native.find_thresholds(W, W.mean(axis=1), W.std(axis=1),
                                 z_range[0], z_range[1])
    if out is not None:
        return out
    tab = _WindowTables(windows)
    Wn = windows.shape[0]
    min_z, max_z = z_range
    starts = np.arange(min_z, max_z)
    S = len(starts)
    rows = np.repeat(np.arange(Wn), S)
    x0 = np.tile(starts.astype(np.float64), Wn)
    xs, costs = _fmin_z_batch(x0, tab, rows)
    xs = xs.reshape(Wn, S)
    finite = (costs < np.inf).reshape(Wn, S)
    any_f = finite.any(axis=1)
    last = S - 1 - np.argmax(finite[:, ::-1], axis=1)
    best_z = np.where(any_f, xs[np.arange(Wn), last], float(min_z))
    return tab.mean + best_z * tab.std


# ---------------------------------------------------------------------------
# batched driver: C cells' interval extraction in vectorized numpy
# ---------------------------------------------------------------------------

def _batch_window_sequences(W, anomaly_padding, min_percent, window_start,
                            sequences, thresholds=None):
    """One threshold window for ALL C cells at once. ``W``: (C, L) view of
    the score matrix; ``thresholds``: per-cell dynamic thresholds, or None
    for the fixed mean + 4 sigma. The per-cell statistics
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
    if thresholds is None:
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
    same default as the serial ``find_anomalies`` — and BOTH modes are
    vectorized across cells: dynamic thresholds run every (cell, z-start)
    fmin problem through one batched Nelder-Mead per window position
    (`_find_thresholds_batch`; interval parity vs the serial oracle in
    tests/test_intervals_batch.py). Returns a list of C interval arrays.
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
    window_size, window_step_size = _window_geometry(
        T, window_size, window_size_portion, window_step_size,
        window_step_size_portion)

    # dynamic thresholds (fixed_threshold falsy, the find_anomalies
    # default): every (cell, z-start) fmin problem of a window position is
    # one batched Nelder-Mead call (round 5 — the round-4 driver fell back
    # to the serial per-cell path here, reintroducing ~13 ms/cell of scipy
    # fmin at grid scale); the serial find_threshold stays the bitwise
    # oracle, final-interval parity vs it is asserted in
    # tests/test_intervals_batch.py
    dynamic = not fixed_threshold

    # replicate the serial window-position schedule up front (the tail
    # window may be shorter: errors[start:start+size] truncates at T)
    starts = []
    ws, we = 0, 0
    while we < T:
        we = ws + window_size
        starts.append(ws)
        ws += window_step_size

    thr_by_start = {}
    thr_inv_by_start = {}
    if dynamic:
        # ONE batched Nelder-Mead per distinct window length (usually one
        # full-size group + at most one truncated tail) — every (cell,
        # window position, z-start) fmin problem runs in lockstep; calling
        # per position instead measured 10x slower in pure numpy call
        # overhead at 200 cells
        by_len = {}
        for s in starts:
            by_len.setdefault(min(s + window_size, T) - s, []).append(s)
        for L, group in by_len.items():
            stack = np.concatenate([E[:, s:s + L] for s in group])
            thr = _find_thresholds_batch(stack).reshape(len(group), C)
            for g, s in enumerate(group):
                thr_by_start[s] = thr[g]
            if lower_threshold:
                mu = stack.mean(axis=1, keepdims=True)
                thr = _find_thresholds_batch(
                    mu - (stack - mu)).reshape(len(group), C)
                for g, s in enumerate(group):
                    thr_inv_by_start[s] = thr[g]

    sequences = [[] for _ in range(C)]
    for window_start in starts:
        window_end = window_start + window_size
        W = E[:, window_start:window_end]
        _batch_window_sequences(W, anomaly_padding, min_percent,
                                window_start, sequences,
                                thresholds=thr_by_start.get(window_start))
        if lower_threshold:
            mean = W.mean(axis=1)
            inverted = mean[:, None] - (W - mean[:, None])
            _batch_window_sequences(
                inverted, anomaly_padding, min_percent, window_start,
                sequences, thresholds=thr_inv_by_start.get(window_start))

    out = []
    for c in range(C):
        index = index_list if shared else index_list[c]
        merged = merge_sequences(sequences[c])
        out.append(np.asarray([[index[int(start)], index[int(stop)], score]
                               for start, stop, score in merged]))
    return out
