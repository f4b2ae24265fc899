"""Regression tests for review findings (round 1 self-review)."""

import numpy as np
import pandas as pd
import pytest

from hypad_tpu.detect import scorer as sc
from hypad_tpu.ops.rolling import rolling_mean_centered


def test_reconstruction_errors_smooth_false_returns_raw():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((300, 50))
    y_hat = y + 0.1 * rng.standard_normal((300, 50))
    raw, _ = sc.reconstruction_errors(y, y_hat, "point", smooth=False)
    smoothed, _ = sc.reconstruction_errors(y, y_hat, "point", smooth=True)
    # raw must be |true - pred|, not the rolling mean
    from hypad_tpu.ops.unroll import true_series, unroll_median
    import jax.numpy as jnp

    want = np.abs(np.asarray(true_series(jnp.asarray(y, jnp.float32)))
                  - np.asarray(unroll_median(jnp.asarray(y_hat, jnp.float32))))
    np.testing.assert_allclose(raw, want, rtol=1e-5, atol=1e-6)
    assert not np.allclose(raw, smoothed)


def test_rolling_mean_skips_nans_like_pandas():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(120)
    x[[5, 6, 50, 100]] = np.nan
    for w, mp in ((10, 5), (7, 3)):
        want = pd.Series(x).rolling(w, center=True, min_periods=mp).mean().values
        got = np.asarray(rolling_mean_centered(x.astype(np.float32), w, mp))
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-6, equal_nan=True)


def test_euclidean_invalid_combination_raises():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((150, 50))
    with pytest.raises(ValueError, match="Unknown combination"):
        sc.score_anomalies_euclidean(y, y, rng.standard_normal(150),
                                     comb="uncertainty")


def test_detector_propagates_unexpected_metric_failures(monkeypatch,
                                                        tmp_path):
    """A poisoned metrics path must raise, not silently report
    confusion=[0,0,0,0] (round-1 review: the bare except ate regressions).
    Only ZeroDivisionError (empty predictions / no GT, the case the
    reference's try/except excuses) maps to zeros."""
    from types import SimpleNamespace

    import jax

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect import detector as det
    from hypad_tpu.detect import metrics as mt
    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(0)
    n, w = 40, 20
    test_data = SignalData(
        X=rng.uniform(-1, 1, (n, w)).astype(np.float32),
        y=np.zeros((n, 1), np.float32),
        X_index=np.arange(n, dtype=np.float64),
        y_index=np.arange(n, dtype=np.float64) + w,
        index=np.arange(n + w, dtype=np.float64),
    )
    params = SimpleNamespace(signal="sig", dataset="NAB", hyperbolic=False,
                             combination="rec", rec_error="point", load=False,
                             save_result=False)
    model = init_tadgan(jax.random.PRNGKey(0), signal_shape=w,
                        hyperbolic=False)
    known = pd.DataFrame({"start": [5.0], "end": [9.0]})

    def poisoned(*a, **k):
        raise ValueError("poisoned metrics")

    monkeypatch.setattr(mt, "contextual_confusion_matrix", poisoned)
    with pytest.raises(ValueError, match="poisoned metrics"):
        det.detect(params, model, test_data, str(tmp_path / "run"),
                   known_anomalies=known)


def test_detector_zeroes_confusion_on_empty_predictions(tmp_path):
    """ZeroDivisionError from empty predictions still maps to [0,0,0,0]
    (the reference behavior, utils/anomaly_detection_utils.py:105-113)."""
    from types import SimpleNamespace

    import jax

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect import detector as det
    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(1)
    n, w = 40, 20
    # constant-ish windows -> typically no intervals above mean+4sigma with
    # an untrained model; empty GT guarantees the ZeroDivisionError branch
    test_data = SignalData(
        X=rng.uniform(-0.01, 0.01, (n, w)).astype(np.float32),
        y=np.zeros((n, 1), np.float32),
        X_index=np.arange(n, dtype=np.float64),
        y_index=np.arange(n, dtype=np.float64) + w,
        index=np.arange(n + w, dtype=np.float64),
    )
    params = SimpleNamespace(signal="sig", dataset="NAB", hyperbolic=False,
                             combination="rec", rec_error="point", load=False,
                             save_result=False)
    model = init_tadgan(jax.random.PRNGKey(0), signal_shape=w,
                        hyperbolic=False)
    known = pd.DataFrame(columns=["start", "end"])
    result = det.detect(params, model, test_data, str(tmp_path / "run"),
                        known_anomalies=known)
    assert list(result["confusion"]) == [0, 0, 0, 0]
    assert result["metrics"] is None


def test_integer_smoothing_window_not_capped():
    """score_anomalies passes trunc(N*0.01) as an int, which the reference
    does NOT cap at 200; the float proportion path IS capped."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal((600, 20))
    y_hat = y + 0.05 * rng.standard_normal((600, 20))
    capped, _ = sc.reconstruction_errors(y, y_hat, "point",
                                         smoothing_window=0.5)  # ->200 cap
    uncapped, _ = sc.reconstruction_errors(y, y_hat, "point",
                                           smoothing_window=300)
    assert not np.allclose(capped, uncapped)


def test_save_artifacts_false_skips_persistence_same_result(tmp_path):
    """save_artifacts: false (opt-in extension) must produce identical
    scores/intervals while persisting no inference tensors."""
    from types import SimpleNamespace

    import jax

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect import detector as det
    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(5)
    n, w = 150, 50
    test_data = SignalData(
        X=rng.uniform(-1, 1, (n, w)).astype(np.float32),
        y=np.zeros((n, 1), np.float32),
        X_index=np.arange(n, dtype=np.float64),
        y_index=np.arange(n, dtype=np.float64) + w,
        index=np.arange(n + w, dtype=np.float64),
    )
    known = pd.DataFrame({"start": [30.0], "end": [60.0]})
    model = init_tadgan(jax.random.PRNGKey(1), signal_shape=w,
                        hyperbolic=True)

    def run(save_artifacts, d):
        params = SimpleNamespace(signal="s", dataset="NAB", hyperbolic=True,
                                 combination="uncertainty",
                                 rec_error="point", load=False,
                                 save_result=False,
                                 save_artifacts=save_artifacts)
        return det.detect(params, model, test_data, str(tmp_path / d),
                          known_anomalies=known)

    r1 = run(True, "with")
    r2 = run(False, "without")
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6)
    assert [tuple(i) for i in r1["intervals"]] == \
           [tuple(i) for i in r2["intervals"]]
    import glob
    import os
    assert glob.glob(os.path.join(tmp_path, "with", "inference*"))
    assert not glob.glob(os.path.join(tmp_path, "without", "inference*"))


# ---------------------------------------------------------------------------
# round-3 review fixes (VERDICT.md item 1 + ADVICE.md rounds 2)
# ---------------------------------------------------------------------------

def _tiny_model(w=50, hyperbolic=True, seed=7):
    import jax

    from hypad_tpu.models.tadgan import init_tadgan

    return init_tadgan(jax.random.PRNGKey(seed), signal_shape=w,
                       hyperbolic=hyperbolic)


def test_detect_scores_x_host_matches_device_readback():
    """Passing X_host alongside a device-resident X must yield artifacts
    identical to letting the scorer read X back from device."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    X = rng.uniform(-1, 1, (120, 50)).astype(np.float32)
    params = _tiny_model()
    X_dev = jnp.asarray(X)
    want, want_inf = sc.detect_scores(params, X_dev, True, "uncertainty")
    got, got_inf = sc.detect_scores(params, X_dev, True, "uncertainty",
                                    X_host=X)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_inf.gt_signal, want_inf.gt_signal)
    assert isinstance(got_inf.gt_signal, np.ndarray)


def test_detect_scores_casts_non_f32_device_arrays():
    """ADVICE r2: a bfloat16 device array must be cast to float32 before
    tracing so device scores and persisted artifacts agree."""
    import jax.numpy as jnp

    rng = np.random.default_rng(32)
    X = rng.uniform(-1, 1, (120, 50)).astype(np.float32)
    params = _tiny_model()
    want, _ = sc.detect_scores(params, X, True, "uncertainty")
    X_bf16 = jnp.asarray(X).astype(jnp.bfloat16)
    got, got_inf = sc.detect_scores(params, X_bf16, True, "uncertainty")
    # the cast costs precision once (bf16 storage) but the program must run
    # in f32 and the artifacts must be f32
    assert got_inf.gt_signal.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.2)


def test_detect_scores_fallback_honors_fetch_inference(monkeypatch):
    """ADVICE r2: above ONE_CALL_MAX_WINDOWS the staged fallback must still
    return (scores, None) when fetch_inference=False."""
    monkeypatch.setattr(sc, "ONE_CALL_MAX_WINDOWS", 64)
    rng = np.random.default_rng(33)
    X = rng.uniform(-1, 1, (120, 50)).astype(np.float32)
    params = _tiny_model()
    scores, inference = sc.detect_scores(params, X, True, "uncertainty",
                                         fetch_inference=False)
    assert inference is None
    want, want_inf = sc.detect_scores(params, X, True, "uncertainty")
    assert want_inf is not None
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)


def test_detector_stages_windows_on_device_and_reuses(tmp_path):
    """VERDICT r2 item 1: the CLI detection path stages test windows on
    device once (test_data.X_device) and a pre-staged array is reused —
    scores identical either way."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect import detector as det

    n, w = 150, 50

    def mk():
        # fresh generator per dataset: d1.X must equal d2.X exactly
        rng = np.random.default_rng(34)
        return SignalData(
            X=rng.uniform(-1, 1, (n, w)).astype(np.float32),
            y=np.zeros((n, 1), np.float32),
            X_index=np.arange(n, dtype=np.float64),
            y_index=np.arange(n, dtype=np.float64) + w,
            index=np.arange(n + w, dtype=np.float64),
        )

    d1 = mk()
    d2 = mk()
    known = pd.DataFrame({"start": [30.0], "end": [60.0]})
    model = _tiny_model(w=w)
    params = SimpleNamespace(signal="s", dataset="NAB", hyperbolic=True,
                             combination="uncertainty", rec_error="point",
                             load=False, save_result=False,
                             save_artifacts=False)

    # fresh dataset: detector stages and pins the device copy
    r1 = det.detect(params, model, d1, str(tmp_path / "a"),
                    known_anomalies=known)
    assert getattr(d1, "X_device", None) is not None

    # pre-staged dataset (the cmd_train reuse path): same result
    d2.X_device = jnp.asarray(d2.X)
    r2 = det.detect(params, model, d2, str(tmp_path / "b"),
                    known_anomalies=known)
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6,
                               atol=1e-7)


def test_detection_plots_reference_behavior(tmp_path):
    """save_plots=None follows the reference: anomaly overlay saved for
    multivariate runs (utils/anomaly_detection_utils.py:220), none for
    univariate; save_plots=True forces it for univariate too."""
    import os
    from types import SimpleNamespace

    from hypad_tpu.data.pipeline import SignalData
    from hypad_tpu.detect import detector as det

    rng = np.random.default_rng(40)
    n, w = 120, 30
    test_data = SignalData(
        X=rng.uniform(-1, 1, (n, w)).astype(np.float32),
        y=np.zeros((n, 1), np.float32),
        X_index=np.arange(n, dtype=np.float64),
        y_index=np.arange(n, dtype=np.float64) + w,
        index=np.arange(n + w, dtype=np.float64),
    )
    known = pd.DataFrame({"start": [30.0], "end": [60.0]})
    model = _tiny_model(w=w)

    def run(d, signal, save_plots):
        params = SimpleNamespace(signal=signal, dataset="NAB",
                                 hyperbolic=True, combination="rec",
                                 rec_error="point", load=False,
                                 save_result=False, save_artifacts=False,
                                 save_plots=save_plots)
        det.detect(params, model, test_data, str(tmp_path / d),
                   known_anomalies=known, save_plots=save_plots)
        return os.path.exists(tmp_path / d / "anomalies.png")

    assert not run("uni_default", "s", None)         # univariate: no plot
    assert run("uni_forced", "s", True)              # forced on
    assert run("mv_default", "multivariate", None)   # mv: reference plots
    assert not run("mv_off", "multivariate", False)  # forced off


def test_kde_sentinel_debug_guard(monkeypatch):
    """HYPAD_DEBUG=1 makes the 1e18 masked-entry sentinel contract explicit:
    values anywhere near it raise instead of silently corrupting the
    density argmax (ops/kde.py sentinel block)."""
    import numpy as np
    import jax.numpy as jnp
    import hypad_tpu.ops.kde as kde

    monkeypatch.setattr(kde, "_DEBUG", True)
    vals = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)),
                       jnp.float32)
    mask = jnp.ones((4, 8), bool)
    # in-bound values pass
    out = np.asarray(kde.kde_argmax_rows(vals, mask))
    assert out.shape == (4,)
    # out-of-bound values trip the callback
    bad = vals.at[1, 3].set(1e16)
    import pytest
    with pytest.raises(Exception, match="sentinel"):
        np.asarray(kde.kde_argmax_rows(bad, mask))
    # masked out-of-bound values are fine (they ARE the sentinel's job)
    np.asarray(kde.kde_argmax_rows(bad, mask.at[1, 3].set(False)))
