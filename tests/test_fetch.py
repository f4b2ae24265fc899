"""Acquisition-layer tests: cache-first download, load_csv/load_signal,
casas_anomalies parity vs the reference loop."""

import numpy as np
import pandas as pd
import pytest

from hypad_tpu.data import fetch
from reference_oracle import load_reference_adu


def test_download_uses_cache(tmp_path):
    df = pd.DataFrame({"timestamp": [1, 2, 3], "value": [0.1, 0.2, 0.3]})
    df.to_csv(tmp_path / "sig.csv", index=False)
    out = fetch.download("sig", str(tmp_path))
    pd.testing.assert_frame_equal(out, df)


def test_download_miss_raises_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="not cached"):
        fetch.download("never-existing-signal-xyz", str(tmp_path))


def test_download_tail_split(tmp_path):
    df = pd.DataFrame({"timestamp": range(10), "value": range(10)})
    df.to_csv(tmp_path / "s.csv", index=False)
    train, test = fetch.download("s", str(tmp_path), test_size=0.3)
    assert len(train) == 7 and len(test) == 3


def test_load_csv_positional_columns(tmp_path):
    p = tmp_path / "raw.csv"
    pd.DataFrame([[5, 1.0, 100], [6, 2.0, 200]]).to_csv(p, index=False,
                                                        header=False)
    out = fetch.load_csv(str(p), timestamp_column=0, value_column=2)
    assert list(out.columns) == ["timestamp", "value"]
    assert out["value"].tolist() == [100, 200]
    with pytest.raises(ValueError):
        fetch.load_csv(str(p), timestamp_column=1, value_column=1)
    with pytest.raises(ValueError):
        fetch.load_csv(str(p), value_column=1)


def test_load_signal_types(tmp_path):
    p = tmp_path / "sig.csv"
    pd.DataFrame({"timestamp": ["1", "2"], "value": ["3.5", "4.5"]}).to_csv(
        p, index=False)
    out = fetch.load_signal(str(p))
    assert out["timestamp"].dtype.kind == "i"
    assert out["value"].dtype.kind == "f"


def test_nasa_registry():
    assert "C-2" in fetch.NASA_SIGNALS
    assert len(fetch.NASA_SIGNALS) == 80


def test_casas_anomalies_matches_reference():
    adu = load_reference_adu()
    rng = np.random.default_rng(0)
    y = (rng.random(200) < 0.2).astype(int).reshape(20, 10)
    y[-1, -1] = 0  # reference drops runs touching the end; keep comparable
    x_index = np.arange(200) * 10.0
    import torch

    want = adu.casas_anomalies(torch.tensor(y.reshape(-1, 1)), x_index)
    got = fetch.casas_anomalies(y, x_index)
    pd.testing.assert_frame_equal(
        got.astype(float), want.astype(float))
