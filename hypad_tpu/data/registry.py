"""Dataset registry — dispatch on config to concrete datasets (layer L4).

Replicates the branch structure of the reference ``utils/data.py:252-379``
(``dataset_selection``) over a configurable ``data_root`` (the reference
hardcodes ``./data``; our data roots may be read-only, e.g. the mounted
reference corpus). Returns (train, test, read_path) like the reference.

Branches:
  * ``unique_dataset: True``   -> same CSV for train and test (NAB style)
  * dataset in A1..A4          -> Yahoo benchmark CSV, interval forced to 1
  * otherwise univariate       -> ``{signal}-train.csv`` / ``{signal}-test.csv``
  * dataset in SWAT/WADI/CASAS family -> multivariate loaders
"""

from __future__ import annotations

import os

from hypad_tpu.data import multivariate as mv
from hypad_tpu.data.pipeline import load_signal_dataset

YAHOO_DATASETS = ("A1", "A2", "A3", "A4")
MULTIVARIATE_DATASETS = ("CASAS_", "new_CASAS", "SWAT", "WADI", "CASAS",
                         "ELINUS", "eHealth")


def dataset_selection(params, cache_dir=None):
    """params: config namespace (see utils/config.py). Returns
    (train_data, test_data, read_path)."""
    data_root = getattr(params, "data_root", "./data")

    if params.dataset in MULTIVARIATE_DATASETS:
        return mv.load_multivariate(params, data_root)

    if getattr(params, "unique_dataset", False):
        path = os.path.join(data_root, f"{params.signal}.csv")
        train = load_signal_dataset(path, interval=params.interval,
                                    cache_dir=cache_dir)
        test = train  # identical preprocessing; reference re-reads the file
        return train, test, path

    if params.dataset in YAHOO_DATASETS:
        path = os.path.join(
            data_root, "YAHOO", f"{params.dataset}Benchmark",
            f"{params.signal}.csv"
        )
        # interval hardcoded to 1 for Yahoo (reference utils/data.py:349,:357)
        train = load_signal_dataset(path, interval=1, yahoo=True,
                                    cache_dir=cache_dir)
        test = train
        return train, test, path

    train_path = os.path.join(data_root, f"{params.signal}-train.csv")
    test_path = os.path.join(data_root, f"{params.signal}-test.csv")
    train = load_signal_dataset(train_path, interval=params.interval,
                                cache_dir=cache_dir)
    test = load_signal_dataset(test_path, interval=params.interval,
                               cache_dir=cache_dir)
    return train, test, test_path
