"""Multivariate fleet detection: a whole multivariate family (e.g. every
CASAS resident) trained and scored in ONE vmapped program.

Lifts round-3's univariate-only fleet restriction (VERDICT r3 item 4). The
correctness anchor is the per-signal multivariate ``detect_scores`` /
``detect_scores_grid`` path, itself golden vs the reference scoring stages
(tests/test_multivariate_glue.py). Families are deliberately ragged so the
masked mv reductions (zscore over the real row prefix, ragged critic KDE)
are exercised off the static path.
"""

import os

import jax
import numpy as np
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import fleet as fl

F = 24
LENS = (220, 160, 100)


def _toy_rows(n, seed):
    """(n, F) per-timestep feature rows scaled to [-1, 1] like the mv
    loaders' MinMaxScaler output."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, F)).cumsum(axis=0)
    lo, hi = X.min(axis=0), X.max(axis=0)
    return (2 * (X - lo) / np.maximum(hi - lo, 1e-9) - 1).astype(np.float32)


def _family(hyperbolic):
    params = [init_tadgan(jax.random.PRNGKey(11 + i), signal_shape=F,
                          hyperbolic=hyperbolic)
              for i in range(len(LENS))]
    X_list = [_toy_rows(n, seed=i) for i, n in enumerate(LENS)]
    return fl.stack_states(params), params, X_list


def _per_signal(params, X_list, hyperbolic, combination):
    return [sc.detect_scores(p, X, hyperbolic, combination,
                             multivariate=True, fetch_inference=False)[0]
            for p, X in zip(params, X_list)]


@pytest.mark.parametrize("hyperbolic,combination", [
    (True, "rec"),
    (True, "uncertainty"),
    (False, "rec"),
    (False, "mult"),
])
def test_mv_fleet_matches_per_signal(hyperbolic, combination):
    stacked, params, X_list = _family(hyperbolic)
    expected = _per_signal(params, X_list, hyperbolic, combination)
    got = sc.detect_scores_fleet(stacked, X_list, hyperbolic, combination,
                                 multivariate=True)
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        assert g.shape == e.shape          # per-timestep: (N_i,)
        np.testing.assert_allclose(g, e, rtol=3e-4, atol=1e-5)


def test_mv_fleet_grid_matches_per_signal():
    stacked, params, X_list = _family(True)
    combos = ("rec", "mult", "uncertainty")
    want = [sc.detect_scores_grid(p, X, True, combos, multivariate=True)
            for p, X in zip(params, X_list)]
    got = sc.detect_scores_fleet_grid(stacked, X_list, True, combos,
                                      multivariate=True)
    for gcells, wcells in zip(got, want):
        assert gcells.keys() == wcells.keys()
        for k in wcells:
            np.testing.assert_allclose(gcells[k], wcells[k],
                                       rtol=3e-4, atol=1e-5)


def test_mv_fleet_width_mismatch_raises():
    stacked, params, X_list = _family(False)
    X_list[1] = X_list[1][:, :-1]
    with pytest.raises(ValueError, match="width"):
        sc.detect_scores_fleet(stacked, X_list, False, "rec",
                               multivariate=True)


# ---------------------------------------------------------------------------
# CLI: a two-resident CASAS family sweep in one fleet program
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def casas_two_residents(tmp_path_factory):
    """CASAS layout with TWO points (kitchen, bedroom): shared
    normal_sequences.pt train tensor, per-point test sequences + ground
    truth (reference utils/data.py:300-326 layout)."""
    import torch

    root = tmp_path_factory.mktemp("casas2")
    rng = np.random.default_rng(5)

    def t(a):
        return torch.tensor(np.asarray(a, dtype=np.float32))

    base = root / "DATASETS" / "CASAS"
    os.makedirs(base, exist_ok=True)
    torch.save(t(rng.standard_normal((16, 4, 150))),
               base / "normal_sequences.pt")
    for i, point in enumerate(("kitchen", "bedroom")):
        n_test = 60 - 6 * i                      # ragged family
        test = rng.standard_normal((n_test, 150))
        test[20:30] += 4.0
        gt = np.zeros(n_test)
        gt[20:30] = 1
        d = base / "POINTS" / point
        os.makedirs(d, exist_ok=True)
        torch.save(t(test), d / f"{point}_sequences_id1.pt")
        torch.save(t(gt), d / f"{point}_groundtruth_id1.pt")
    return str(root)


def test_casas_family_sweep_cli(casas_two_residents, tmp_path, capsys):
    """`hypad sweep --signals kitchen,bedroom` on a CASAS config: both
    residents train in one fleet program and score in one vmapped mv fleet
    detection program, each landing its own run dir + results row."""
    import yaml

    from hypad_tpu import cli

    cfg = {
        "dataset": "CASAS", "signal": "kitchen", "id": 1, "epochs": 2,
        "hyperbolic": True, "signal_shape": 150, "batch_size": 16,
        "lr": 5e-4, "rec_error": "point", "combination": "rec",
        "data_root": casas_two_residents, "output_root": str(tmp_path),
        "devices": 1, "save_result": True, "filename": "casas_sweep.csv",
    }
    cfg_path = tmp_path / "casas.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["sweep", "--config", str(cfg_path),
              "--signals", "kitchen,bedroom"])
    out = capsys.readouterr().out
    assert "fleet detection wall-clock" in out
    assert "--- kitchen ---" in out and "--- bedroom ---" in out

    model_root = (tmp_path / "trained_models"
                  / "models_hyper_CASAS_2_0.0005" / "CASAS")
    for point in ("kitchen", "bedroom"):
        run_dir = model_root / point
        assert (run_dir / "state_final").exists()
        assert (run_dir / "anomalies.csv").exists()

    # detect-only re-entry over the same family (fleet path, no retraining)
    cli.main(["sweep", "--config", str(cfg_path),
              "--signals", "kitchen,bedroom", "--detect-only"])
    out = capsys.readouterr().out
    assert "fleet detection wall-clock" in out

    # mv family grid: every resident x combination cell in one program
    cli.main(["sweep", "--config", str(cfg_path),
              "--signals", "kitchen,bedroom", "--detect-only",
              "--combinations", "rec,mult"])
    out = capsys.readouterr().out
    assert "fleet grid detection wall-clock" in out
    import pandas as pd

    table = pd.read_csv(model_root / "kitchen" / "sweep_grid.csv")
    assert set(table["combination"]) == {"rec", "mult"}
    assert len(table) == 4                      # 2 residents x 2 cells
