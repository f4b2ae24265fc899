"""Grid detection (detect_scores_grid / detector.detect_grid / CLI
--combinations): every (rec_error x combination) cell from ONE device
program must equal the per-cell staged scorers.

The reference serves this sweep by re-running anomaly_detection.py per cell
with `load: true` (reference README.md:87-89); our grid is one traced
program, so each cell is asserted against the independently-computed
score_anomalies_* output.
"""

import os

import jax
import numpy as np
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.models.tadgan import init_tadgan

HYPER_COMBOS = sc.CRITIC_COMBOS + ("rec", "rec_uncertainty")


@pytest.fixture(scope="module")
def windows():
    rng = np.random.default_rng(40)
    return rng.uniform(-1, 1, (300, 100)).astype(np.float32)


@pytest.fixture(scope="module")
def hyper_params():
    return init_tadgan(jax.random.PRNGKey(31), signal_shape=100,
                       hyperbolic=True)


@pytest.fixture(scope="module")
def eucl_params():
    return init_tadgan(jax.random.PRNGKey(32), signal_shape=100,
                       hyperbolic=False)


def test_hyperbolic_grid_matches_per_cell(windows, hyper_params):
    grid = sc.detect_scores_grid(hyper_params, windows, True, HYPER_COMBOS)
    assert set(grid) == {(None, cb) for cb in HYPER_COMBOS}
    inf = sc.run_inference(hyper_params, windows, True)
    for cb in HYPER_COMBOS:
        want = sc.score_anomalies_hyperbolic(inf, cb)
        np.testing.assert_allclose(grid[(None, cb)], want, rtol=1e-6,
                                   atol=1e-7, err_msg=cb)


def test_euclidean_grid_matches_per_cell(windows, eucl_params):
    recs = ("point", "area", "dtw")
    grid = sc.detect_scores_grid(eucl_params, windows, False,
                                 sc.EUCL_COMBOS, rec_errors=recs)
    assert set(grid) == {(r, cb) for r in recs for cb in sc.EUCL_COMBOS}
    inf = sc.run_inference(eucl_params, windows, False)
    for r in recs:
        for cb in sc.EUCL_COMBOS:
            want = sc.score_anomalies_euclidean(
                inf.true_signal, inf.recons_signal, inf.critic_score,
                rec_error_type=r, comb=cb)
            np.testing.assert_allclose(grid[(r, cb)], want, rtol=1e-6,
                                       atol=1e-7, err_msg=f"{r}/{cb}")


@pytest.mark.parametrize("hyperbolic", [True, False])
def test_multivariate_grid_matches_per_cell(hyperbolic):
    rng = np.random.default_rng(41)
    X = rng.uniform(-1, 1, (400, 51)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(33), signal_shape=51,
                         hyperbolic=hyperbolic)
    combos = ("mult", "uncertainty", "rec")
    grid = sc.detect_scores_grid(params, X, hyperbolic, combos,
                                 multivariate=True)
    inf = sc.run_inference(params, X, hyperbolic)
    for cb in combos:
        want = sc.score_anomalies_multivariate(inf, cb, hyperbolic)
        np.testing.assert_allclose(grid[(None, cb)], want, rtol=1e-6,
                                   atol=1e-7, err_msg=cb)


def test_grid_validates_cells(windows, eucl_params):
    with pytest.raises(ValueError, match="combination"):
        sc.detect_scores_grid(eucl_params, windows, False, ("uncertainty",))
    with pytest.raises(ValueError, match="rec_error"):
        sc.detect_scores_grid(eucl_params, windows, False, ("mult",),
                              rec_errors=("median",))


def test_grid_accepts_device_resident_windows(windows, hyper_params):
    import jax.numpy as jnp

    want = sc.detect_scores_grid(hyper_params, windows, True,
                                 ("uncertainty",))
    got = sc.detect_scores_grid(hyper_params,
                                jax.device_put(jnp.asarray(windows)), True,
                                ("uncertainty",))
    np.testing.assert_array_equal(got[(None, "uncertainty")],
                                  want[(None, "uncertainty")])


def test_grid_large_input_fallback(monkeypatch, windows, eucl_params):
    """Beyond ONE_CALL_MAX_WINDOWS the grid must fall back to the chunked
    run_inference + per-cell scoring (HBM-bounded like detect_scores), with
    identical cells."""
    recs = ("point", "area")
    want = sc.detect_scores_grid(eucl_params, windows, False,
                                 sc.EUCL_COMBOS, rec_errors=recs)
    monkeypatch.setattr(sc, "ONE_CALL_MAX_WINDOWS", 64)
    got = sc.detect_scores_grid(eucl_params, windows, False,
                                sc.EUCL_COMBOS, rec_errors=recs)
    assert set(got) == set(want)
    for cell in want:
        np.testing.assert_allclose(got[cell], want[cell], rtol=1e-6,
                                   atol=1e-7, err_msg=str(cell))


def test_grid_warns_rec_error_sweep_on_hyperbolic(windows, hyper_params):
    """A >1 rec_errors request on the hyperbolic path is silently
    inapplicable — the grid must say so."""
    with pytest.warns(UserWarning, match="rec_errors apply only"):
        sc.detect_scores_grid(hyper_params, windows, True, ("uncertainty",),
                              rec_errors=("point", "area"))


def _structured_windows(n, seed):
    """Sine+noise windows (test_fleet_detect.py style): uniform-random rows
    put KDE argmax near ties, where the padded program's float
    reassociation flips to an adjacent grid point — structured signals keep
    the comparison meaningful."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n + 100)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + 100)
    X = np.stack([s[i:i + 100] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def test_fleet_grid_matches_per_signal_hyper(hyper_params):
    """detect_scores_fleet_grid == per-signal detect_scores_grid on a
    ragged hyperbolic family (padded/masked reductions must not leak)."""
    X_list = [_structured_windows(n, seed=i)
              for i, n in enumerate((300, 257, 280))]
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * 3), hyper_params)
    combos = ("uncertainty", "mult", "rec")
    fleet = sc.detect_scores_fleet_grid(stacked, X_list, True, combos)
    assert len(fleet) == 3
    for i, X in enumerate(X_list):
        want = sc.detect_scores_grid(hyper_params, X, True, combos)
        for cell in want:
            # fleet-vs-per-signal tolerance (test_fleet_detect.py): the
            # masked padded reductions reassociate float ops
            np.testing.assert_allclose(fleet[i][cell], want[cell],
                                       rtol=3e-4, atol=1e-5,
                                       err_msg=f"signal {i} cell {cell}")


def test_fleet_grid_matches_per_signal_eucl(eucl_params):
    """Euclidean fleet grid: ragged family x (rec_errors x combinations),
    incl. the dtw/area unroll boundaries under padding."""
    X_list = [_structured_windows(n, seed=10 + i)
              for i, n in enumerate((220, 180))]
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * 2), eucl_params)
    recs = ("point", "dtw")
    fleet = sc.detect_scores_fleet_grid(stacked, X_list, False,
                                        sc.EUCL_COMBOS, rec_errors=recs)
    for i, X in enumerate(X_list):
        want = sc.detect_scores_grid(eucl_params, X, False, sc.EUCL_COMBOS,
                                     rec_errors=recs)
        assert set(fleet[i]) == set(want)
        for cell in want:
            # fleet-vs-per-signal tolerance (test_fleet_detect.py); atol
            # covers the 'sum' cells, whose values are near-zero
            # differences where padded-dtw float accumulation shows as
            # ~1.5e-5 absolute
            np.testing.assert_allclose(fleet[i][cell], want[cell],
                                       rtol=3e-4, atol=5e-5,
                                       err_msg=f"signal {i} cell {cell}")


def test_fleet_grid_on_mesh_matches_unsharded(hyper_params):
    """The signal axis sharded over the dp mesh changes nothing."""
    from hypad_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(44)
    X_list = [rng.uniform(-1, 1, (150, 100)).astype(np.float32)
              for _ in range(4)]
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * 4), hyper_params)
    combos = ("uncertainty", "critic")
    base = sc.detect_scores_fleet_grid(stacked, X_list, True, combos)
    mesh = make_mesh("all")
    sharded = sc.detect_scores_fleet_grid(stacked, X_list, True, combos,
                                          mesh=mesh)
    for i in range(4):
        for cell in base[i]:
            np.testing.assert_allclose(sharded[i][cell], base[i][cell],
                                       rtol=3e-4, atol=1e-5)


def test_cli_grid_end_to_end(tmp_path):
    """Train a tiny run, then `detect --combinations all --rec-errors ...`
    must write grid_results.csv with one row per cell and per-cell metrics
    that match an independent single-cell `detect` run."""
    import pandas as pd
    import yaml

    from hypad_tpu import cli

    cfg = {
        "dataset": "NAB", "signal": "Twitter_volume_AAPL", "epochs": 1,
        "hyperbolic": False, "signal_shape": 100, "batch_size": 64,
        "lr": 5e-4, "rec_error": "point", "combination": "mult",
        "unique_dataset": True,
        "data_root": "/root/reference/data", "output_root": str(tmp_path),
        "devices": 1,
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    cli.main(["train", "--config", str(cfg_path)])
    cli.main(["detect", "--config", str(cfg_path),
              "--rec-errors", "point,area", "--combinations", "all"])

    run_dirs = [os.path.join(root, "grid_results.csv")
                for root, _, files in os.walk(tmp_path)
                if "grid_results.csv" in files]
    assert len(run_dirs) == 1
    table = pd.read_csv(run_dirs[0])
    assert len(table) == 2 * len(sc.EUCL_COMBOS)
    assert set(table["combination"]) == set(sc.EUCL_COMBOS)
    assert set(table["rec_error"]) == {"point", "area"}

    # the grid's (point, mult) cell == the plain single-cell detect run
    from hypad_tpu.utils.config import load_config

    params = load_config(dict(cfg))
    single = cli.cmd_detect(params, str(cfg_path))
    cell = table[(table["rec_error"] == "point")
                 & (table["combination"] == "mult")].iloc[0]
    assert (int(cell["tp"]), int(cell["fp"]), int(cell["fn"])) == (
        int(single["confusion"][3]), int(single["confusion"][1]),
        int(single["confusion"][2]))


def test_fleet_grid_chunked_matches_full(monkeypatch, eucl_params):
    """HBM-bounded signal chunking (FLEET_MAX_PAIR_ELEMS) reassembles the
    same per-signal per-cell grid as the single-call fleet grid program."""
    X_list = [_structured_windows(n, seed=20 + i)
              for i, n in enumerate((220, 180, 150))]
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([np.asarray(x)] * 3), eucl_params)
    recs = ("point", "dtw")
    full = sc.detect_scores_fleet_grid(stacked, X_list, False,
                                       sc.EUCL_COMBOS, rec_errors=recs)
    monkeypatch.setattr(sc, "FLEET_MAX_PAIR_ELEMS",
                        2 * (220 + 99) * 100 * 100)  # 2 signals per chunk
    chunked = sc.detect_scores_fleet_grid(stacked, X_list, False,
                                          sc.EUCL_COMBOS, rec_errors=recs)
    for i in range(3):
        assert set(chunked[i]) == set(full[i])
        for cell in full[i]:
            # chunked signals run under a different compiled vmap width than
            # the full-fleet program; XLA reassociates f32 reductions per
            # shape, so dtw/critic chains drift ~1e-5 (not row mixing —
            # that would be O(1); padded replica rows are dropped before
            # comparison). atol dominates: z-scored 'sum' scores cross zero.
            np.testing.assert_allclose(chunked[i][cell], full[i][cell],
                                       rtol=1e-4, atol=2e-5,
                                       err_msg=f"signal {i} cell {cell}")
