"""CLI `sweep` subcommand e2e: a 2-signal NAB family through
config -> fleet training -> per-signal detection -> results CSV.

Fleet==sequential numerics are covered in test_fleet.py; this drives the
full user surface (the capability the reference covers by re-running
main.py per signal, main.py:14-70)."""

import os

import numpy as np
import yaml

NAB_DATA = "/root/reference/data"


def test_sweep_cli_two_signal_nab(tmp_path, capsys):
    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 1,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True, "save_result": True,
        "filename": "nab_results.csv",
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
        "signals": ["Twitter_volume_AAPL", "Twitter_volume_AMZN"],
    }
    cfg_path = tmp_path / "nab_sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path)])

    out = capsys.readouterr().out
    assert "sweep training wall-clock" in out
    assert "--- Twitter_volume_AAPL ---" in out
    assert "--- Twitter_volume_AMZN ---" in out

    base = (tmp_path / "trained_models" / "models_eucl_NAB_1_0.0005"
            / "NAB")
    for sig in cfg["signals"]:
        run_dir = base / sig
        assert (run_dir / "state_final").exists()   # per-signal checkpoint
        assert (run_dir / "config.yaml").exists()   # snapshot
        assert (run_dir / "anomalies.csv").exists()  # detector artifact
        # sweep detection is the fleet (scores-only) path: no per-signal
        # inference artifacts are persisted
        assert not (run_dir / "inference.npz").exists()
    assert (base / cfg["signals"][0] / "sweep_log.jsonl").exists()

    # one cumulative results row per signal (reference results CSV shape)
    import pandas as pd

    res = pd.read_csv(tmp_path / "results" / "nab_results.csv")
    assert list(res["signal"]) == cfg["signals"]

    # ---- detect-only re-entry: restore the checkpoints just written and
    # re-run the one-program fleet detection without retraining
    first = base / cfg["signals"][0] / "anomalies.csv"
    before = pd.read_csv(first)
    cli.main(["sweep", "--config", str(cfg_path), "--detect-only"])
    out = capsys.readouterr().out
    assert "sweep training wall-clock" not in out
    assert "fleet detection wall-clock" in out
    assert "--- Twitter_volume_AMZN ---" in out
    # same checkpoints -> same intervals as the training run's detection
    pd.testing.assert_frame_equal(pd.read_csv(first), before)

    # ---- family x grid: --detect-only + grid flags re-scores every
    # (signal x rec_error x combination) cell in one vmapped program
    cli.main(["sweep", "--config", str(cfg_path), "--detect-only",
              "--rec-errors", "point,area", "--combinations", "all"])
    out = capsys.readouterr().out
    assert "fleet grid detection wall-clock" in out
    assert "sweep grid mean f1" in out
    grid = pd.read_csv(base / cfg["signals"][0] / "sweep_grid.csv")
    assert len(grid) == 2 * 2 * 4  # signals x rec_errors x EUCL_COMBOS
    assert set(grid["signal"]) == set(cfg["signals"])
    assert set(grid["rec_error"]) == {"point", "area"}
    # each run dir also gets its per-signal grid_results.csv
    for s in cfg["signals"]:
        per = pd.read_csv(base / s / "grid_results.csv")
        assert len(per) == 8
        # the grid's cells for this signal match the family table
        fam = grid[grid["signal"] == s]
        for _, row in per.iterrows():
            if not pd.isna(row.get("f1", np.nan)):
                match = fam[(fam["rec_error"] == row["rec_error"])
                            & (fam["combination"] == row["combination"])]
                # grid_results.csv rounds to 6 decimals; sweep_grid.csv
                # stores full precision
                assert abs(float(match["f1"].iloc[0]) - row["f1"]) < 1e-6


def test_sweep_detect_only_missing_checkpoints(tmp_path):
    """--detect-only on an untrained family must fail with a clear message,
    not an orbax traceback."""
    import pytest
    import yaml

    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 1,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
        "signals": ["Twitter_volume_AAPL"],
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(SystemExit, match="state_final"):
        cli.main(["sweep", "--config", str(cfg_path), "--detect-only"])


def test_sweep_seed_band(tmp_path, capsys):
    """--seeds trains the config's one signal as a seed band in one fleet
    program; each seed lands in its own seed_{k}/ run tree."""
    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 1,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
    }
    cfg_path = tmp_path / "nab_band.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path), "--seeds", "0,3"])
    out = capsys.readouterr().out
    assert "--- Twitter_volume_AAPL (seed 0) ---" in out
    assert "--- Twitter_volume_AAPL (seed 3) ---" in out
    for k in (0, 3):
        run_dir = (tmp_path / f"seed_{k}" / "trained_models"
                   / "models_eucl_NAB_1_0.0005" / "NAB"
                   / "Twitter_volume_AAPL")
        assert (run_dir / "state_final").exists()
        assert (run_dir / "anomalies.csv").exists()
        # the snapshot holds the EFFECTIVE params: this run's seed/root
        snap = yaml.safe_load((run_dir / "config.yaml").read_text())
        assert snap["seed"] == k
        assert snap["output_root"].endswith(f"seed_{k}")

    # detect re-enters a band run from its own snapshot
    run_dir = (tmp_path / "seed_3" / "trained_models"
               / "models_eucl_NAB_1_0.0005" / "NAB" / "Twitter_volume_AAPL")
    cli.main(["detect", "--config", str(run_dir / "config.yaml")])
    assert "detection wall-clock" in capsys.readouterr().out

    # --detect-only composes with --seeds: the band re-scores from its
    # per-seed checkpoints without retraining
    cli.main(["sweep", "--config", str(cfg_path), "--seeds", "0,3",
              "--detect-only"])
    out = capsys.readouterr().out
    assert "sweep training wall-clock" not in out
    assert "--- Twitter_volume_AAPL (seed 3) ---" in out


def test_seeds_flag_overrides_config_signals(tmp_path, capsys):
    """--seeds with a config that carries a signals: list trains the
    config's ONE signal as a band (the list is ignored)."""
    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 0,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
        "signals": ["Twitter_volume_AAPL", "Twitter_volume_AMZN"],
    }
    cfg_path = tmp_path / "nab.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path), "--seeds", "5"])
    out = capsys.readouterr().out
    assert "--- Twitter_volume_AAPL (seed 5) ---" in out
    assert "--- Twitter_volume_AMZN" not in out


def test_sweep_cross_product(tmp_path, capsys):
    """--signals x --seeds trains every (signal, seed) pair in one fleet
    program, each in its own seed_{k}/ run tree."""
    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 1,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
    }
    cfg_path = tmp_path / "nab.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path),
              "--signals", "Twitter_volume_AAPL,Twitter_volume_AMZN",
              "--seeds", "0,2"])
    out = capsys.readouterr().out
    for sig in ("Twitter_volume_AAPL", "Twitter_volume_AMZN"):
        for k in (0, 2):
            assert f"--- {sig} (seed {k}) ---" in out
            run_dir = (tmp_path / f"seed_{k}" / "trained_models"
                       / "models_eucl_NAB_1_0.0005" / "NAB" / sig)
            assert (run_dir / "state_final").exists()
            snap = yaml.safe_load((run_dir / "config.yaml").read_text())
            assert snap["seed"] == k and snap["signal"] == sig
    assert "for 4 models x 1 epochs" in out


def test_sweep_signals_flag_overrides_config(tmp_path, capsys):
    """--signals wins over the config list (argv surface)."""
    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 0,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": NAB_DATA, "output_root": str(tmp_path), "devices": 1,
        "signals": ["Twitter_volume_AAPL", "Twitter_volume_AMZN"],
    }
    cfg_path = tmp_path / "nab_sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path),
              "--signals", "Twitter_volume_AAPL"])
    out = capsys.readouterr().out
    assert "--- Twitter_volume_AAPL ---" in out
    assert "--- Twitter_volume_AMZN ---" not in out
    assert os.path.isdir(tmp_path / "trained_models" /
                         "models_eucl_NAB_0_0.0005" / "NAB" /
                         "Twitter_volume_AAPL")
