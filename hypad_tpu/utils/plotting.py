"""Anomaly visualization (reference plot_anomalies,
utils/anomaly_detection_utils.py:261-276; utils/utils.py:87-262).

The reference's plot_anomalies has a loop bug (only the LAST anomaly set's
intervals are drawn because the inner loop sits outside the outer one,
:266-273); here every set is drawn — the bug is documented, not reproduced.
"""

from __future__ import annotations

import os

import numpy as np


def plot_anomaly_intervals(anomaly_frames, x_index, series, out_dir,
                           filename="anomalies.png"):
    """anomaly_frames: list of DataFrames with start/end columns; the first
    is drawn red (predicted), the rest green (ground truth)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = ["red"] + ["green"] * (len(anomaly_frames) - 1)
    fig, ax = plt.subplots(figsize=(25, 5))
    ax.plot(np.asarray(x_index)[: len(series)], np.asarray(series), lw=0.8)
    for frame, color in zip(anomaly_frames, colors):
        for _, row in frame.iterrows():
            ax.axvspan(row["start"], row["end"], color=color, alpha=0.2)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, filename)
    fig.savefig(out, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out


def unroll_ts(y_hat):
    """Per-timestep median unroll for visualization, dropping the first
    W-1 positions (reference utils/utils.py:87-102)."""
    from hypad_tpu.ops.unroll import unroll_median

    full = np.asarray(unroll_median(np.asarray(y_hat, np.float32)))
    return full[y_hat.shape[1] - 1:]


def plot_ts(series_list, labels=None, title="signal", out_path=None):
    """Multi-series line plot (reference plot_ts, utils/utils.py:115-136)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not isinstance(series_list, list):
        series_list = [series_list]
    fig, ax = plt.subplots(figsize=(30, 6))
    for x in series_list:
        ax.plot(range(len(x)), x)
    ax.set_title(title, size=34)
    ax.set_xlabel("Time", size=30)
    ax.set_xlim([0, max(len(x) for x in series_list) - 1])
    if labels:
        ax.legend(labels=labels, loc=1, prop={"size": 26})
    if out_path:
        fig.savefig(out_path)
    plt.close(fig)
    return fig


def plot_signal_with_anomalies(df, anomalies=(), signal="signal", path=""):
    """Timestamped signal plot with shaded anomaly spans; the first anomaly
    frame is drawn red (predicted), the rest green (ground truth)
    (reference plot, utils/utils.py:166-223)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.dates as mdates
    import matplotlib.pyplot as plt
    import pandas as pd
    from datetime import datetime

    dfs = [df] if isinstance(df, pd.DataFrame) else list(df)
    anomalies = list(anomalies) if isinstance(anomalies, (list, tuple)) \
        else [anomalies]
    time = [datetime.fromtimestamp(t) for t in dfs[0]["timestamp"]]

    fig, ax = plt.subplots(figsize=(30, 6))
    for frame in dfs:
        ax.plot(time, frame["value"])
    colors = ["red"] + ["green"] * (len(anomalies) - 1)
    for color, anomaly in zip(colors, anomalies):
        if not isinstance(anomaly, list):
            anomaly = list(anomaly[["start", "end"]].itertuples(index=False))
        for anom in anomaly:
            ax.axvspan(datetime.fromtimestamp(anom[0]),
                       datetime.fromtimestamp(anom[1]), color=color,
                       alpha=0.2)
    ax.set_title(signal, size=34)
    ax.set_xlabel("Time", size=30)
    ax.set_xlim([time[0], time[-1]])
    ax.xaxis.set_major_locator(mdates.MonthLocator())
    ax.xaxis.set_major_formatter(mdates.DateFormatter("%b"))
    out = os.path.join(path, "anomalies.jpg") if path else "anomalies.jpg"
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_error(series_groups, out_path=None):
    """Stacked error panels (reference plot_error, utils/utils.py:139-163):
    each entry is either a pair of series (drawn together on a double-height
    panel) or a single series (drawn red)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(30, 6))
    gs = gridspec.GridSpec(3, 1)
    gs.update(wspace=0.025, hspace=0.05)
    i = 0
    for group in series_groups:
        if isinstance(group, (list, tuple)) and len(group) == 2:
            ax = plt.subplot(gs[i:i + 2])
            for line in group:
                ax.plot(range(len(line)), line)
            i += 1
        else:
            ax = plt.subplot(gs[i])
            ax.plot(range(len(group)), group, color="tab:red")
        i += 1
        ax.set_xticklabels([])
    if out_path:
        fig.savefig(out_path)
    plt.close(fig)
    return fig


def plot_rolling_windows(X, window=100, k=5, out_path=None):
    """Grid of sample rolling windows (reference plot_rws,
    utils/utils.py:226-262, without its duplicated-first-panel quirks)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    X = np.asarray(X)
    shift = 75
    rows = int(np.ceil(k / 5)) + 1
    fig = plt.figure(figsize=(15, rows * 2))
    for i in range(k):
        j = i * shift if i >= 2 else i
        if j >= len(X):
            break
        ax = fig.add_subplot(rows, 5, i + 1)
        ax.plot(range(j, j + X.shape[1]), X[j], lw=2)
        ax.set_title(f"window {j}", size=16)
        ax.set_ylim([-1, 1])
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path)
    plt.close(fig)
    return fig
