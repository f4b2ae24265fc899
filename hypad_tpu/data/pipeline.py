"""Vectorized signal-preprocessing pipeline (layer L4).

Behavior spec: reference ``utils/dataloader.py`` — per-interval mean
aggregation (:99-137), mean imputation + (-1,1) min-max scaling (:86-89),
rolling windows (:139-222), Yahoo detrend / synthetic timestamps /
known-anomaly extraction (:14-58). The reference implements aggregation and
windowing as Python ``while`` loops over pandas subsets; here every stage is a
closed-form numpy array op (bincount bucketing, stride-tricks windowing), so
preprocessing a full signal costs microseconds and hands the device a single
contiguous (N, window) array.

All of this is host-side preparation; arrays it produces are fed to the
device once per run (float32). Divergences from the reference (documented):
  * bucket membership uses floor((t - t0)/interval); identical to the
    reference's ``.loc[t0 : t0+interval-1]`` ranges for the integer-valued
    timestamps of every dataset shipped with the reference.
  * the Yahoo known-anomaly CSV is written beside the source CSV when the
    data dir's mode bits allow (the reference behavior,
    utils/dataloader.py:14-32), atomically via temp-file + os.replace; when
    the data root is read-only it falls back to the run/cache dir instead.
"""

from __future__ import annotations

import dataclasses
import json
import os
import stat
from datetime import datetime
from typing import Optional

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# elementary stages
# ---------------------------------------------------------------------------

def detrend(values: np.ndarray) -> np.ndarray:
    """Linear least-squares detrend (scipy.signal.detrend(type='linear')
    equivalent; reference utils/dataloader.py:36-38)."""
    values = np.asarray(values, dtype=np.float64)
    n = len(values)
    t = np.arange(n, dtype=np.float64)
    t_mean = t.mean()
    v_mean = values.mean()
    slope = ((t - t_mean) * (values - v_mean)).sum() / ((t - t_mean) ** 2).sum()
    return values - (v_mean + slope * (t - t_mean))


def synthetic_timestamps(n: int) -> np.ndarray:
    """Per-second epoch timestamps starting 2012-11-24 local time
    (reference utils/dataloader.py:67-75 builds them with dateutil.rrule)."""
    start = datetime(2012, 11, 24).timestamp()
    return start + np.arange(n, dtype=np.float64)


def extract_known_anomalies(is_anomaly: np.ndarray,
                            timestamps: np.ndarray) -> pd.DataFrame:
    """Contiguous runs of is_anomaly==1 -> (start, end) timestamp intervals
    (reference utils/dataloader.py:14-32, shifted-cumsum grouping)."""
    flags = np.asarray(is_anomaly).astype(int)
    starts, ends = [], []
    in_run = False
    for i, f in enumerate(flags):
        if f == 1 and not in_run:
            starts.append(timestamps[i])
            in_run = True
        if f != 1 and in_run:
            ends.append(timestamps[i - 1])
            in_run = False
    if in_run:
        ends.append(timestamps[len(flags) - 1])
    return pd.DataFrame({"start": starts, "end": ends})


def time_segments_aggregate(values: np.ndarray, timestamps: np.ndarray,
                            interval: float):
    """Per-interval mean aggregation (reference utils/dataloader.py:99-137).

    Returns (aggregated values (n_buckets, n_cols), bucket-start index
    (n_buckets,)). Buckets with no samples aggregate to NaN (imputed later),
    exactly like the reference's ``mean(skipna=True)`` over an empty subset.
    """
    order = np.argsort(timestamps, kind="stable")
    ts = np.asarray(timestamps, dtype=np.float64)[order]
    vals = np.asarray(values, dtype=np.float64)[order]
    if vals.ndim == 1:
        vals = vals[:, None]

    t0, t_max = ts[0], ts[-1]
    n_buckets = int(np.floor((t_max - t0) / interval)) + 1
    bucket = np.floor((ts - t0) / interval).astype(np.int64)
    bucket = np.clip(bucket, 0, n_buckets - 1)

    out = np.empty((n_buckets, vals.shape[1]), dtype=np.float64)
    valid = ~np.isnan(vals)
    for c in range(vals.shape[1]):
        sums = np.bincount(bucket, weights=np.where(valid[:, c], vals[:, c], 0.0),
                           minlength=n_buckets)
        counts = np.bincount(bucket, weights=valid[:, c].astype(np.float64),
                             minlength=n_buckets)
        with np.errstate(invalid="ignore"):
            out[:, c] = sums / counts  # 0/0 -> NaN for empty buckets
    index = t0 + interval * np.arange(n_buckets, dtype=np.float64)
    return out, index


def impute_mean(X: np.ndarray) -> np.ndarray:
    """Column-mean imputation of NaNs (sklearn SimpleImputer default;
    reference utils/dataloader.py:86-87)."""
    X = np.array(X, dtype=np.float64, copy=True)
    col_mean = np.nanmean(X, axis=0)
    nan_pos = np.isnan(X)
    X[nan_pos] = np.take(col_mean, np.nonzero(nan_pos)[1])
    return X


def minmax_scale(X: np.ndarray, feature_range=(-1.0, 1.0)) -> np.ndarray:
    """Per-column min-max scaling (sklearn MinMaxScaler;
    reference utils/dataloader.py:88-89)."""
    lo, hi = feature_range
    mn = X.min(axis=0)
    mx = X.max(axis=0)
    scale = np.where(mx > mn, (hi - lo) / np.where(mx > mn, mx - mn, 1.0), 0.0)
    return (X - mn) * scale + lo


def rolling_windows(X: np.ndarray, index: np.ndarray, window_size=100,
                    target_size=1, step_size=1, target_column=0):
    """Stride-tricks rolling windows (reference utils/dataloader.py:139-222).

    Returns (windows (M, window, n_cols-squeezed), targets (M, target_size),
    X_index (M,), y_index (M,)), M = len(X) - window - target + 1 stepped.
    """
    X = np.ascontiguousarray(X)
    target = X[:, target_column]
    n = len(X)
    max_start = n - window_size - target_size + 1
    starts = np.arange(0, max(max_start, 0), step_size)
    if len(starts) == 0:
        raise ValueError(
            f"signal of length {n} too short for window {window_size}"
        )
    win = np.lib.stride_tricks.sliding_window_view(X, window_size, axis=0)
    # sliding_window_view gives (n-w+1, n_cols, w); reorder to (M, w, n_cols)
    out_X = win.transpose(0, 2, 1)[starts]
    tgt = np.lib.stride_tricks.sliding_window_view(target, target_size)
    out_y = tgt[starts + window_size]
    X_index = np.asarray(index)[starts]
    y_index = np.asarray(index)[starts + window_size]
    if out_X.shape[-1] == 1:
        out_X = out_X[..., 0]
    return out_X, out_y, X_index, y_index


# ---------------------------------------------------------------------------
# SignalDataset equivalent
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SignalData:
    """Fully preprocessed univariate signal, ready for the device."""
    X: np.ndarray            # (M, window) float32 windows
    y: np.ndarray            # (M, target) targets
    X_index: np.ndarray      # (M,) window-start timestamps
    y_index: np.ndarray      # (M,) target timestamps
    index: np.ndarray        # (n_buckets,) aggregated timeline
    known_anomalies: Optional[pd.DataFrame] = None

    def __len__(self):
        return len(self.X)


def load_signal_dataset(path: str, interval: float = 21600,
                        window_size: int = 100, yahoo: bool = False,
                        cache_dir: Optional[str] = None,
                        engine: str = "auto") -> SignalData:
    """CSV -> SignalData, replicating SignalDataset (utils/dataloader.py:61-97).

    Yahoo CSVs (columns value/is_anomaly or value/anomaly) are detrended,
    given synthetic per-second timestamps, and their ground-truth intervals
    extracted (reference :65-78); ``interval`` is forced to 1 by the caller
    for Yahoo, as in the reference registry (utils/data.py:349,:357).
    """
    df = pd.read_csv(path)
    known = None
    if yahoo:
        df["value"] = detrend(df["value"].values)
        # synthetic timestamps are assigned BEFORE the anomaly-column
        # fallback — A3/A4 CSVs have 'timestamps'/'anomaly' columns and the
        # reference's except-branch selects the freshly assigned 'timestamp'
        # (utils/dataloader.py:65-78 then :14-21)
        df["timestamp"] = synthetic_timestamps(len(df))
        if "is_anomaly" not in df.columns and "anomaly" in df.columns:
            df = df[["timestamp", "value", "anomaly"]].copy()
            df = df.sort_values(by=["timestamp"])
            df.columns = ["timestamp", "value", "is_anomaly"]
        known = extract_known_anomalies(df["is_anomaly"].values,
                                        df["timestamp"].values)
        # the reference writes the intervals beside the source CSV
        # (save_known_anomalies, utils/dataloader.py:14-32 called at :77);
        # data roots whose mode bits mark them read-only (e.g. a vendored
        # benchmark checkout) fall back to the run dir instead — checked via
        # the mode bit, not os.access, because root bypasses permissions
        src_dir = os.path.dirname(os.path.abspath(path))
        writable = bool(os.stat(src_dir).st_mode & stat.S_IWUSR)
        try:
            if writable:
                # temp-file + os.replace: a partial write (ENOSPC, signal)
                # must never leave a truncated *_known_anomalies.csv beside
                # the source — the reference pipeline reads that file back
                # (anomaly_detection.py:35) and would silently use it
                dst = path[:-4] + "_known_anomalies.csv"
                tmp = dst + ".tmp"
                try:
                    known.to_csv(tmp)
                    os.replace(tmp, dst)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
        except OSError:
            writable = False
        if not writable and cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            base = os.path.basename(path)[:-4] + "_known_anomalies.csv"
            known.to_csv(os.path.join(cache_dir, base))
        df = df[["timestamp", "value"]]

    if engine in ("auto", "native"):
        # native C++ single-pass core (native/pipeline.cpp); identical
        # numerics, parity-tested in tests/test_native.py
        from hypad_tpu.data import native

        res = native.prepare_univariate(
            df["timestamp"].values, df["value"].values, interval,
            window_size=window_size)
        if res is not None:
            out_X, out_y, X_index, y_index, index = res
            return SignalData(X=out_X, y=out_y, X_index=X_index,
                              y_index=y_index, index=index,
                              known_anomalies=known)
        if engine == "native":
            raise RuntimeError("native pipeline unavailable or signal too "
                               "short; build native/ or use engine='numpy'")

    agg, index = time_segments_aggregate(
        df["value"].values, df["timestamp"].values, interval
    )
    X = minmax_scale(impute_mean(agg))
    out_X, out_y, X_index, y_index = rolling_windows(
        X, index, window_size=window_size
    )
    return SignalData(
        X=out_X.astype(np.float32),
        y=out_y.astype(np.float32),
        X_index=X_index,
        y_index=y_index,
        index=index,
        known_anomalies=known,
    )


def load_anomalies(signal: str, data_root: str) -> pd.DataFrame:
    """Ground-truth intervals for NASA/NAB signals from ``anomalies.csv``
    (reference utils/data.py:227-249)."""
    anomalies = pd.read_csv(os.path.join(data_root, "anomalies.csv"))
    events = anomalies.set_index("signal").loc[signal].values[0]
    return pd.DataFrame(json.loads(events), columns=["start", "end"])


# batching lives on device: the trainer shuffles with jax.random.permutation
# inside the fused epoch program (train/trainer.py:_shuffled_batches) and the
# scorer batches its own inference chunks (detect/scorer.py:run_inference) —
# the reference's DataLoader semantics (drop_last shuffled train batches,
# sequential full-coverage test batches, main.py:35-48) are reproduced there.
