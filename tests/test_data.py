"""Data-pipeline parity tests: our vectorized stages vs the reference's
pandas/sklearn implementation, executed directly from the read-only
reference checkout (golden-oracle strategy, SURVEY.md §4)."""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

from hypad_tpu.data import pipeline as dp

REF = "/root/reference"
NAB_CSV = os.path.join(REF, "data", "Twitter_volume_AAPL.csv")
YAHOO_CSV = os.path.join(REF, "data", "YAHOO", "A1Benchmark", "real_1.csv")


def _load_reference_dataloader():
    spec = importlib.util.spec_from_file_location(
        "ref_dataloader", os.path.join(REF, "utils", "dataloader.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_dl():
    return _load_reference_dataloader()


@pytest.mark.parametrize("interval", [21600, 3600])
def test_nab_pipeline_matches_reference(ref_dl, interval):
    ref = ref_dl.SignalDataset(NAB_CSV, interval=interval)
    got = dp.load_signal_dataset(NAB_CSV, interval=interval)
    # reference keeps a trailing singleton column dim and float64; we store
    # squeezed float32 windows
    np.testing.assert_allclose(got.X, ref.X.squeeze(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.y, ref.y, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.X_index, ref.X_index)
    np.testing.assert_allclose(got.y_index, ref.y_index)
    np.testing.assert_allclose(got.index, ref.index)


def test_yahoo_pipeline_matches_reference(ref_dl, tmp_path):
    # the reference writes *_known_anomalies.csv next to the source file;
    # copy the csv to a writable dir first so it can do that
    import shutil

    local_csv = tmp_path / "real_1.csv"
    shutil.copy(YAHOO_CSV, local_csv)
    ref = ref_dl.SignalDataset(str(local_csv), interval=1, yahoo=True)
    got = dp.load_signal_dataset(YAHOO_CSV, interval=1, yahoo=True)
    np.testing.assert_allclose(got.X, ref.X.squeeze(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.X_index, ref.X_index)
    # known anomalies must match the csv the reference wrote
    ref_known = pd.read_csv(tmp_path / "real_1_known_anomalies.csv")
    # reference builds rows in reverse order (prepends); compare as sets
    got_rows = set(map(tuple, got.known_anomalies[["start", "end"]].values))
    ref_rows = set(map(tuple, ref_known[["start", "end"]].values))
    assert got_rows == ref_rows


def test_known_anomalies_written_beside_source(tmp_path):
    # reference behavior (utils/dataloader.py:77 -> :14-32): the intervals
    # CSV lands beside the source file when its directory is writable ...
    import shutil

    local_csv = tmp_path / "real_1.csv"
    shutil.copy(YAHOO_CSV, local_csv)
    got = dp.load_signal_dataset(str(local_csv), interval=1, yahoo=True)
    out = tmp_path / "real_1_known_anomalies.csv"
    assert out.exists()
    written = pd.read_csv(out, index_col=0)
    np.testing.assert_array_equal(
        written[["start", "end"]].values,
        got.known_anomalies[["start", "end"]].values)

    # ... and a read-only data root (mode bits, e.g. the vendored checkout)
    # falls back to the run-dir cache instead of writing beside the source
    ro = tmp_path / "ro"
    ro.mkdir()
    shutil.copy(YAHOO_CSV, ro / "real_1.csv")
    ro.chmod(0o555)
    cache = tmp_path / "cache"
    try:
        dp.load_signal_dataset(str(ro / "real_1.csv"), interval=1,
                               yahoo=True, cache_dir=str(cache))
    finally:
        ro.chmod(0o755)
    assert not (ro / "real_1_known_anomalies.csv").exists()
    assert (cache / "real_1_known_anomalies.csv").exists()


def test_detrend_matches_scipy():
    from scipy import signal as ss

    rng = np.random.default_rng(0)
    v = np.cumsum(rng.standard_normal(500)) + np.linspace(0, 10, 500)
    np.testing.assert_allclose(dp.detrend(v), ss.detrend(v), atol=1e-9)


def test_impute_and_scale_match_sklearn():
    from sklearn.impute import SimpleImputer
    from sklearn.preprocessing import MinMaxScaler

    rng = np.random.default_rng(1)
    X = rng.standard_normal((50, 3))
    X[rng.random((50, 3)) < 0.1] = np.nan
    want = MinMaxScaler((-1, 1)).fit_transform(SimpleImputer().fit_transform(X))
    got = dp.minmax_scale(dp.impute_mean(X))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_load_anomalies():
    df = dp.load_anomalies("Twitter_volume_AAPL",
                           os.path.join(REF, "data"))
    assert list(df.columns) == ["start", "end"]
    assert len(df) >= 1
    assert (df["end"] >= df["start"]).all()


def test_trainer_shuffle_is_droplast_permutation():
    """Device-side batching parity with the reference DataLoader semantics
    (drop_last=True shuffled batches, main.py:35-41): the trainer's
    _shuffled_batches must be a permutation without replacement reshaped to
    (n_batches, B, ...)."""
    import jax
    import jax.numpy as jnp

    from hypad_tpu.train.trainer import _shuffled_batches

    X = jnp.arange(130, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
    batches = _shuffled_batches(jax.random.PRNGKey(0), X, 4, 32)
    assert batches.shape == (4, 32, 4)  # drop_last: 130//32 = 4 batches
    vals = np.asarray(batches[:, :, 0]).ravel()
    assert len(np.unique(vals)) == len(vals)
