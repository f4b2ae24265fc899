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
