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


def test_swat_full_cli_train_detect(swat_root, tmp_path, capsys):
    """Drive the ENTIRE pipeline through the CLI surface (config file ->
    hypad_tpu.cli.main -> registry -> trainer -> detector -> artifacts), the
    turnkey equivalent of the reference `python main.py --config
    configs/multivariate.yaml` on a SWAT-shaped corpus."""
    import yaml

    from hypad_tpu import cli

    root, label = swat_root
    cfg = {
        "dataset": "SWAT", "signal": "multivariate", "epochs": 2,
        "hyperbolic": True, "signal_shape": 12, "batch_size": 32,
        "lr": 5e-4, "rec_error": "point", "combination": "rec",
        "data_root": root, "output_root": str(tmp_path), "devices": 1,
    }
    cfg_path = tmp_path / "swat.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["train", "--config", str(cfg_path)])

    out = capsys.readouterr().out
    assert "training wall-clock" in out
    assert "detection wall-clock" in out
    run_dir = (tmp_path / "trained_models" /
               "models_hyper_SWAT_2_0.0005" / "SWAT")
    assert (run_dir / "anomalies.csv").exists()       # detector artifact
    assert (run_dir / "config.yaml").exists()         # config snapshot
    assert (run_dir / "state_final").exists()         # orbax checkpoint

    # detect-only entry re-loads the final checkpoint
    cli.main(["detect", "--config", str(cfg_path)])
    out = capsys.readouterr().out
    assert "detection wall-clock" in out

    # multivariate grid detection through the CLI: every combination cell
    # from one program, per-cell rows in grid_results.csv
    cli.main(["detect", "--config", str(cfg_path),
              "--combinations", "rec,mult,uncertainty"])
    out = capsys.readouterr().out
    assert "grid detection wall-clock" in out
    table = pd.read_csv(run_dir / "grid_results.csv")
    assert set(table["combination"]) == {"rec", "mult", "uncertainty"}
    assert len(table) == 3


@pytest.fixture(scope="module")
def wadi_root(tmp_path_factory):
    """WADI-shaped fixture (reference utils/dataloader_multivariate.py:91-106:
    train CSV is features-only; test CSV adds Time and label columns)."""
    root = tmp_path_factory.mktemp("data")
    os.makedirs(root / "WADI_downsampled")
    rng = np.random.default_rng(1)
    n, f = 300, 9
    base = rng.standard_normal((n, f)).cumsum(axis=0) * 0.01
    cols = [f"w{i}" for i in range(f)]
    pd.DataFrame(base, columns=cols).to_csv(
        root / "WADI_downsampled" / "WADI_train.csv", index=False)
    test_vals = base.copy()
    test_vals[100:140] -= 2.5
    test = pd.DataFrame(test_vals, columns=cols)
    test.insert(0, "Time", np.arange(n))
    test["label"] = (np.arange(n) >= 100) & (np.arange(n) < 140)
    test.to_csv(root / "WADI_downsampled" / "WADI_test_mine.csv", index=False)
    return str(root)


def test_wadi_full_cli_train_detect(wadi_root, tmp_path, capsys):
    import yaml

    from hypad_tpu import cli

    cfg = {
        "dataset": "WADI", "signal": "multivariate", "epochs": 1,
        "hyperbolic": False, "signal_shape": 9, "batch_size": 32,
        "lr": 5e-4, "rec_error": "point", "combination": "rec",
        "data_root": wadi_root, "output_root": str(tmp_path), "devices": 1,
    }
    cfg_path = tmp_path / "wadi.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.main(["train", "--config", str(cfg_path)])
    out = capsys.readouterr().out
    assert "detection wall-clock" in out
    run_dir = (tmp_path / "trained_models" /
               "models_eucl_WADI_1_0.0005" / "WADI")
    assert (run_dir / "anomalies.csv").exists()


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
