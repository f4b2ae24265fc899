"""Smoke tests for the visualization layer (files written, unroll math)."""

import numpy as np
import pandas as pd

from hypad_tpu.utils import plotting as pl
from reference_oracle import load_reference_adu


def test_unroll_ts_matches_reference_helper():
    rng = np.random.default_rng(0)
    y_hat = rng.standard_normal((40, 10)).astype(np.float64)
    got = pl.unroll_ts(y_hat)
    # reference helper (utils/utils.py:87-102): median anti-diagonal unroll
    # minus the first W-1 entries
    preds = []
    N, W = y_hat.shape
    for i in range(N + W - 1):
        vals = [y_hat[i - j, j] for j in range(max(0, i - N + 1),
                                               min(i + 1, W))]
        preds.append(np.median(vals))
    want = np.asarray(preds[W - 1:])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_plot_files_written(tmp_path):
    idx = np.arange(100) * 60 + 1_600_000_000
    series = np.sin(np.arange(100) / 5)
    pred = pd.DataFrame({"start": [idx[10]], "end": [idx[20]]})
    gt = pd.DataFrame({"start": [idx[50]], "end": [idx[60]]})

    out1 = pl.plot_anomaly_intervals([pred, gt], idx, series, str(tmp_path))
    assert out1.endswith("anomalies.png")

    df = pd.DataFrame({"timestamp": idx, "value": series})
    out2 = pl.plot_signal_with_anomalies(df, [pred, gt], path=str(tmp_path))
    assert out2.endswith("anomalies.jpg")

    pl.plot_ts([series, series * 0.5], labels=["a", "b"],
               out_path=str(tmp_path / "ts.jpg"))
    pl.plot_error([(series, series * 0.9), np.abs(series) * 0.1],
                  out_path=str(tmp_path / "err.jpg"))
    pl.plot_rolling_windows(np.stack([series[i:i + 50] for i in range(40)]),
                            window=50, out_path=str(tmp_path / "rws.jpg"))
    import os

    for f in ("anomalies.png", "anomalies.jpg", "ts.jpg", "err.jpg",
              "rws.jpg"):
        assert os.path.getsize(tmp_path / f) > 0
