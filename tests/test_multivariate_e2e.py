"""Synthetic multivariate end-to-end: SWAT-format CSVs through the registry,
training and detection (the reference's SWAT/WADI corpora are not
redistributable; format replicated synthetically)."""

import os
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def swat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    os.makedirs(root / "SWAT")
    rng = np.random.default_rng(0)
    n, f = 400, 12
    base = rng.standard_normal((n, f)).cumsum(axis=0) * 0.01

    train = pd.DataFrame(base, columns=[f"s{i}" for i in range(f)])
    train.insert(0, "Timestamp", np.arange(n))
    train["Normal/Attack"] = "Normal"
    train.to_csv(root / "SWAT" / "SWaT_train_mine.csv")

    test_vals = base.copy()
    test_vals[200:230] += 3.0  # injected anomaly
    test = pd.DataFrame(test_vals, columns=[f"s{i}" for i in range(f)])
    test.insert(0, "Timestamp", np.arange(n))
    test["Normal/Attack"] = "Normal"
    label = np.zeros(n)
    label[200:230] = 1
    test["label"] = label
    test.to_csv(root / "SWAT" / "SWaT_test_mine.csv")
    return str(root), label


def test_swat_loader(swat_root):
    from hypad_tpu.data.registry import dataset_selection

    root, label = swat_root
    params = SimpleNamespace(dataset="SWAT", signal="multivariate",
                             data_root=root)
    train, test, _ = dataset_selection(params)
    assert train.X.shape == (400, 12)
    assert test.X.shape == (400, 12)
    assert train.X.min() >= -1.0 and train.X.max() <= 1.0


def test_multivariate_train_detect_e2e(swat_root, tmp_path):
    import jax

    from hypad_tpu.data.registry import dataset_selection
    from hypad_tpu.detect.detector import detect
    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.train import trainer as tr
    from hypad_tpu.utils.config import load_config

    root, label = swat_root
    params = load_config({
        "dataset": "SWAT", "signal": "multivariate", "epochs": 2,
        "hyperbolic": True, "signal_shape": 12, "batch_size": 32,
        "lr": 5e-4, "combination": "rec", "data_root": root,
        "output_root": str(tmp_path),
    })
    train_data, test_data, _ = dataset_selection(params)
    test_data.y = label

    model = init_tadgan(jax.random.PRNGKey(0), signal_shape=12,
                        hyperbolic=True)
    state = tr.init_train_state(model, lr=5e-4, hyperbolic=True)
    state = tr.train_tadgan(state, train_data.X, lr=5e-4, hyperbolic=True,
                            batch_size=32, n_epochs=2)

    result = detect(params, state.params, test_data, str(tmp_path / "run"))
    assert result["scores"].shape == (400,)
    assert np.all(np.isfinite(result["scores"]))
    # intervals (if any) must be within range
    for start, end, score in result["intervals"]:
        assert 0 <= start <= end < 400
