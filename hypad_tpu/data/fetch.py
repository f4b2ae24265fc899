"""Signal acquisition: local cache + S3 download surface (layer L4).

Behavior spec: reference ``utils/data.py`` —
  * ``download``       (:114-163): resolve a signal name (or s3:// URL) to a
    CSV in the cache directory, fetching from the d3-ai-orion bucket on miss
  * ``download_demo``  (:166-176)
  * ``load_csv``       (:179-205): positional timestamp/value column mapping
  * ``load_signal``    (:208-224): typed load with optional tail test split
  * ``NASA_SIGNALS``   (:30-111): the SMAP/MSL signal registry

This environment is zero-egress, so the network fetch path raises a clear
error pointing at the local cache; the API surface and cache semantics match
the reference so user code ports unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

BUCKET = "d3-ai-orion"
S3_URL = "https://{}.s3.amazonaws.com/{}"

NASA_SIGNALS = (
    "P-1", "S-1", "E-1", "E-2", "E-3", "E-4", "E-5", "E-6", "E-7", "E-8",
    "E-9", "E-10", "E-11", "E-12", "E-13", "A-1", "D-1", "P-3", "D-2", "D-3",
    "D-4", "A-2", "A-3", "A-4", "G-1", "G-2", "D-5", "D-6", "D-7", "F-1",
    "P-4", "G-3", "T-1", "T-2", "D-8", "D-9", "F-2", "G-4", "T-3", "D-11",
    "D-12", "B-1", "G-6", "G-7", "P-7", "R-1", "A-5", "A-6", "A-7", "D-13",
    "A-8", "A-9", "F-3", "M-6", "M-1", "M-2", "S-2", "P-10", "T-4", "T-5",
    "F-7", "M-3", "M-4", "M-5", "P-15", "C-1", "C-2", "T-12", "T-13", "F-4",
    "F-5", "D-14", "T-9", "P-14", "T-8", "P-11", "D-15", "D-16", "M-7",
    "F-8",
)


def download(name, data_path, test_size=None):
    """Resolve ``name`` (signal name or s3://bucket/path.csv) to a DataFrame,
    using ``data_path`` as the cache; on miss, fetch from S3 and cache."""
    url = None
    if name.startswith("s3://"):
        bucket, _, path = name[5:].partition("/")
        url = S3_URL.format(bucket, path)
        filename = os.path.join(data_path, path.split("/")[-1])
    else:
        filename = os.path.join(data_path, name + ".csv")

    if os.path.exists(filename):
        data = pd.read_csv(filename)
    else:
        url = url or S3_URL.format(BUCKET, f"{name}.csv")
        try:
            data = pd.read_csv(url)
        except Exception as exc:
            raise FileNotFoundError(
                f"signal {name!r} not cached at {filename} and remote fetch "
                f"from {url} failed ({exc}); place the CSV in the data root"
            ) from exc
        os.makedirs(data_path, exist_ok=True)
        data.to_csv(filename, index=False)

    if test_size:
        test_length = round(len(data) * test_size)
        return data.iloc[:-test_length], data.iloc[-test_length:]
    return data


def download_demo(data_path, split=False, n=3):
    """Cache the first ``n`` NASA demo signals (reference :166-176)."""
    for signal in NASA_SIGNALS[:n]:
        if split:
            download(signal + "-train", data_path)
            download(signal + "-test", data_path)
        else:
            download(signal, data_path)


def load_csv(path, timestamp_column=None, value_column=None):
    """CSV load with positional column mapping (reference :179-205)."""
    header = None if timestamp_column is not None else "infer"
    data = pd.read_csv(path, header=header)
    if timestamp_column is None:
        if value_column is not None:
            raise ValueError(
                "If value_column is provided, timestamp_column must be as well")
        return data
    if value_column is None:
        raise ValueError(
            "If timestamp_column is provided, value_column must be as well")
    if timestamp_column == value_column:
        raise ValueError("timestamp_column cannot be the same as value_column")
    return pd.DataFrame({
        "timestamp": data[data.columns[timestamp_column]].values,
        "value": data[data.columns[value_column]].values,
    })[["timestamp", "value"]]


def load_signal(signal, data_path=None, test_size=None, timestamp_column=None,
                value_column=None):
    """Typed signal load with optional tail split (reference :208-224)."""
    if os.path.isfile(signal):
        data = load_csv(signal, timestamp_column, value_column)
    else:
        data = download(signal, data_path or ".")
    data["timestamp"] = data["timestamp"].astype(int)
    data["value"] = data["value"].astype(float)
    if test_size is None:
        return data
    test_length = round(len(data) * test_size)
    return data.iloc[:-test_length], data.iloc[-test_length:]


def casas_anomalies(y, x_index):
    """Multivariate ground-truth runs -> (start, end) DataFrame (reference
    utils/anomaly_detection_utils.py:279-298). Ends at the timestamp of the
    last in-run index minus one position, matching the reference loop."""
    y = np.asarray(y).reshape(-1)[: len(x_index)]
    records = []
    start = None
    last = None
    for i, v in enumerate(y):
        if v == 1:
            if start is None:
                start = x_index[i]
            last = i
        else:
            if start is not None:
                records.append((start, x_index[last - 1]))
                start = None
                last = None
    # NOTE: a run extending to the final sample is dropped — the reference
    # loop only closes runs on a following zero (:286-294); quirk preserved.
    return pd.DataFrame.from_records(records, columns=["start", "end"])
