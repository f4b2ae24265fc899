"""Multivariate dataset loaders (SWAT / WADI / CASAS family).

Behavior spec: reference ``utils/dataloader_multivariate.py:16-121``. Each
example is ONE timestep's feature vector (no windowing); preprocessing is
impute-mean + (-1,1) min-max per column. CASAS-family data arrives as torch
``.pt`` tensors reshaped to (-1, 150); SWAT/WADI as CSVs with meta columns
dropped.

The CASAS/ELINUS/eHealth corpora are not distributed with the reference repo;
the loaders exist for capability parity and raise a clear error when files
are absent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from hypad_tpu.data.pipeline import impute_mean, minmax_scale


class MultivariateData:
    """Preprocessed multivariate stream: X (N, F) float32 and ground truth y."""

    def __init__(self, X, y=None):
        self.X = np.asarray(X, dtype=np.float32)
        self.y = y
        self.X_index = np.arange(len(self.X))
        self.index = np.arange(len(self.X))
        self.known_anomalies = None

    def __len__(self):
        return len(self.X)


def _load_pt(path):
    import torch  # torch-cpu is only used to read the reference .pt format

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"multivariate tensor {path} not found — the CASAS-family corpora "
            "are not shipped with the reference; point data_root at a copy"
        )
    return np.asarray(torch.load(path, weights_only=False))


def _scale(X):
    """SimpleImputer + MinMaxScaler(-1,1) — the SWAT/WADI preprocessing
    (reference utils/dataloader_multivariate.py:78-89)."""
    return minmax_scale(impute_mean(np.asarray(X, dtype=np.float64)))


def _scale_only(X):
    """MinMaxScaler(-1,1) WITHOUT imputation — the CASAS-family .pt branches
    apply only the scaler (reference utils/dataloader_multivariate.py:55-69);
    NaNs, if any, propagate exactly as sklearn's would."""
    return minmax_scale(np.asarray(X, dtype=np.float64))


def load_swat(data_root, test):
    """Reference utils/dataloader_multivariate.py:71-89."""
    if not test:
        df = pd.read_csv(os.path.join(data_root, "SWAT", "SWaT_train_mine.csv"),
                         index_col=0).drop(["Timestamp", "Normal/Attack"], axis=1)
    else:
        df = pd.read_csv(os.path.join(data_root, "SWAT", "SWaT_test_mine.csv"),
                         index_col=0).drop(["Timestamp", "Normal/Attack", "label"],
                                           axis=1)
    return MultivariateData(_scale(df.values))


def load_wadi(data_root, test):
    """Reference utils/dataloader_multivariate.py:91-106."""
    if not test:
        df = pd.read_csv(os.path.join(data_root, "WADI_downsampled",
                                      "WADI_train.csv"))
    else:
        df = pd.read_csv(os.path.join(data_root, "WADI_downsampled",
                                      "WADI_test_mine.csv")).drop(
            ["Time", "label"], axis=1)
    return MultivariateData(_scale(df.values))


def load_casas_family(params, data_root, test):
    """CASAS/ELINUS/eHealth .pt loaders (reference
    utils/dataloader_multivariate.py:65-69, utils/data.py:298-326)."""
    ds = params.dataset
    if not getattr(params, "new_features", False):
        seq = os.path.join(data_root, "DATASETS", ds, "normal_sequences.pt")
        seq_test = os.path.join(
            data_root, "DATASETS", ds, "POINTS", params.signal,
            f"{params.signal}_sequences_id{params.id}.pt")
        gt = os.path.join(
            data_root, "DATASETS", ds, "POINTS", params.signal,
            f"{params.signal}_groundtruth_id{params.id}.pt")
    else:
        seq = os.path.join(data_root, "DATASETS", ds,
                           "normal_sequences_newfeatures.pt")
        seq_test = os.path.join(
            data_root, "DATASETS", ds, "POINTS_NEWFEATURES",
            f"{params.signal}_sequences_newfeatures.pt")
        gt = os.path.join(
            data_root, "DATASETS", ds, "POINTS_NEWFEATURES",
            f"{params.signal}_groundtruth_newfeatures.pt")

    path = seq_test if test else seq
    X = _load_pt(path).reshape(-1, 150)
    # the reference loads the POINTS ground truth for BOTH train and test
    # (dataset_selection passes gt_path to both, utils/data.py:320-326;
    # the CASAS branch always loads y) — only the test copy is consumed
    y = _load_pt(gt)
    return MultivariateData(_scale_only(X), y=y)


def load_multivariate(params, data_root):
    """Dispatch like dataset_selection's multivariate branches
    (reference utils/data.py:259-326). Returns (train, test, read_path)."""
    ds = params.dataset
    if ds == "SWAT":
        return load_swat(data_root, False), load_swat(data_root, True), ""
    if ds == "WADI":
        return load_wadi(data_root, False), load_wadi(data_root, True), ""
    if ds in ("CASAS", "ELINUS", "eHealth"):
        return (load_casas_family(params, data_root, False),
                load_casas_family(params, data_root, True), "")
    if ds == "CASAS_":
        # Reference utils/dataloader_multivariate.py:27-50: drop the first
        # 4500 timesteps, then carve the test span as [first_anomaly-1000,
        # last_anomaly+1000) and train as everything before it; NO scaler on
        # this branch. (The StratifiedShuffleSplit computed there is dead
        # code — its indices are never used. Note the reference's
        # dataset_selection quirk: it forgets dataset=params.dataset for
        # CASAS_ (utils/data.py:259-270), so through ITS CLI the carve-out
        # branch is unreachable — the default dataset="CASAS" branch runs
        # on the 2week tensors instead. We dispatch to the loader's
        # documented CASAS_ branch, making the carve-out actually usable;
        # path default mirrors the reference's sequences_2week naming.)
        base = os.path.join(data_root, "CASAS_")
        seq = _load_pt(getattr(params, "seq_path", None) or os.path.join(
            base, f"sequences_2week_{params.signal}.pt"))
        gt = _load_pt(getattr(params, "gt_path", None) or os.path.join(
            base, f"ground_truth_2week_{params.signal}.pt"))
        X = seq.reshape(seq.shape[0] * seq.shape[1], -1)[4500:]
        y = gt.reshape(gt.shape[0] * gt.shape[1], -1)[4500:]
        anom = np.where(y == 1)[0]
        init, end = anom[0] - 1000, anom[-1] + 1000
        train = MultivariateData(X[:init].reshape(-1, 150), y=y[:init])
        test = MultivariateData(X[init:end].reshape(-1, 150), y=y[init:end])
        return train, test, ""
    if ds == "new_CASAS":
        # reference: seq_path = "path_to_new_CASAS" + signal (a placeholder
        # root, utils/data.py:274-286); scaler only, fit per split
        # (utils/dataloader_multivariate.py:52-63)
        base = os.path.join(data_root, "CASAS", "new_dataset", params.signal)
        train = MultivariateData(
            _scale_only(_load_pt(os.path.join(base, "x_train"))
                        .reshape(-1, 150)),
            y=_load_pt(os.path.join(base, "y_train")))
        test = MultivariateData(
            _scale_only(_load_pt(os.path.join(base, "x_test"))
                        .reshape(-1, 150)),
            y=_load_pt(os.path.join(base, "y_test")))
        return train, test, ""
    raise ValueError(f"unsupported multivariate dataset {ds!r}")
