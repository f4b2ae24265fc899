"""Golden parity tests: our device scoring pipeline vs the reference's
numpy/scipy implementation executed from /root/reference (SURVEY.md §4)."""

import numpy as np
import pytest

from hypad_tpu.detect import intervals as iv
from hypad_tpu.detect import metrics as mt
from hypad_tpu.detect import scorer as sc
from hypad_tpu.ops.dtw import dtw_pair
from reference_oracle import classic_dtw_square, load_reference_adu


@pytest.fixture(scope="module")
def adu():
    return load_reference_adu()


@pytest.fixture(scope="module")
def fake_windows():
    rng = np.random.default_rng(0)
    N, W = 160, 100
    t = np.linspace(0, 12 * np.pi, N + W - 1)
    base = np.sin(t)
    base[300:320] += 2.5  # an anomaly bump
    y = np.stack([base[i:i + W] for i in range(N)])
    y_hat = y + 0.1 * rng.standard_normal((N, W))
    critic = rng.standard_normal(N)
    return y.astype(np.float64), y_hat.astype(np.float64), critic


def test_dtw_pair_matches_oracle():
    rng = np.random.default_rng(1)
    for _ in range(10):
        x = rng.standard_normal(11)
        y = rng.standard_normal(11)
        got = float(dtw_pair(x.astype(np.float32), y.astype(np.float32)))
        want = classic_dtw_square(x, y)
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_final_critic_scores_match(adu, fake_windows):
    y, y_hat, critic = fake_windows
    want = adu.final_critic_scores(critic, y)
    got = sc.final_critic_scores(critic, y)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ret", ["point", "area", "dtw"])
def test_reconstruction_errors_match(adu, fake_windows, ret):
    y, y_hat, _ = fake_windows
    # reference receives (N, W, 1) windows from its loader; ours are (N, W)
    want, _ = adu.reconstruction_errors(y[..., None], y_hat, 1, 10, 0.01,
                                        True, ret)
    want = np.asarray(want, dtype=np.float64)
    got, _ = sc.reconstruction_errors(y, y_hat, rec_error_type=ret)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("comb", ["mult", "sum", "rec", "critic"])
def test_score_anomalies_euclidean_matches(adu, fake_windows, comb):
    y, y_hat, critic = fake_windows
    want, _, _, _ = adu.score_anomalies(
        y[..., None], y_hat, critic, np.arange(len(y)),
        rec_error_type="point", comb=comb, path=None)
    got = sc.score_anomalies_euclidean(y, y_hat, critic,
                                       rec_error_type="point", comb=comb)
    np.testing.assert_allclose(got, np.asarray(want, np.float64),
                               rtol=2e-3, atol=2e-3)


def test_hyperbolic_window_scores_match(adu):
    rng = np.random.default_rng(2)
    N, W = 50, 100
    recons = rng.standard_normal((N, W)) * 0.05
    true = rng.standard_normal((N, W)) * 0.05
    import torch

    td = torch.Tensor(recons).reshape(-1, W)
    pd_ = torch.Tensor(true).reshape(-1, W)
    sqdist = torch.sum((pd_ - td) ** 2, dim=1)
    squ = torch.sum(pd_**2, dim=-1)
    sqv = torch.sum(td**2, dim=-1)
    want = torch.acosh(1 + 2 * sqdist / ((1 - squ) * (1 - sqv)) + 1e-7).numpy()
    got = sc.hyperbolic_window_scores(recons, true)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_combine_scores_all_modes_match(adu):
    rng = np.random.default_rng(3)
    n = 40
    critic = rng.random(n) + 0.5
    rec = rng.random(n) + 0.5
    recons = rng.standard_normal((n, 100)) * 0.1
    for mode in ("sum", "mult", "uncertainty", "critic", "critic_uncertainty",
                 "sum_uncertainty", "rec", "rec_uncertainty"):
        want = adu.combine_scores(mode, critic, rec, recons)
        got = sc.combine_scores(mode, critic, rec, recons)
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"mode={mode}")


def test_find_anomalies_matches_reference(adu, fake_windows):
    y, y_hat, critic = fake_windows
    scores = sc.score_anomalies_euclidean(y, y_hat, critic,
                                          rec_error_type="point", comb="mult")
    index = np.arange(len(scores)) * 100 + 10_000
    want = adu.find_anomalies(scores.reshape(-1), index,
                              window_size_portion=0.33,
                              window_step_size_portion=0.1,
                              fixed_threshold=True)
    got = iv.find_anomalies(scores.reshape(-1), index,
                            window_size_portion=0.33,
                            window_step_size_portion=0.1,
                            fixed_threshold=True)
    assert got.shape == want.shape
    # interval boundaries must be exact; scores inherit f32 rounding from
    # the device scoring stage
    np.testing.assert_array_equal(got[:, :2], want[:, :2])
    np.testing.assert_allclose(got[:, 2], want[:, 2], rtol=1e-5)


def test_find_anomalies_dynamic_threshold_matches(adu):
    rng = np.random.default_rng(4)
    errors = np.abs(rng.standard_normal(400)) + 1.0
    errors[100:110] += 6.0
    index = np.arange(400)
    want = adu.find_anomalies(errors, index, window_size_portion=0.5,
                              window_step_size_portion=0.5,
                              fixed_threshold=False)
    got = iv.find_anomalies(errors, index, window_size_portion=0.5,
                            window_step_size_portion=0.5,
                            fixed_threshold=False)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_contextual_confusion_matrix_matches(adu):
    import pandas as pd

    expected = pd.DataFrame({"start": [100, 500, 900], "end": [150, 600, 950]})
    observed = pd.DataFrame({"start": [120, 700], "end": [160, 800]})
    want = adu.contextual_confusion_matrix(expected, observed, weighted=False)
    got = mt.contextual_confusion_matrix(expected, observed, weighted=False)
    assert got == want
    # sanity: 1 TP (first), 2 FN, 1 FP
    assert got[1:] == (1, 2, 1)


def test_weighted_confusion_matrix_is_documented_unsupported():
    import pandas as pd

    df = pd.DataFrame({"start": [0], "end": [1]})
    with pytest.raises(NotImplementedError):
        mt.contextual_confusion_matrix(df, df, weighted=True)


def test_fused_hyperbolic_scoring_equals_staged():
    """score_anomalies_hyperbolic runs the whole pipeline as ONE device
    program; it must equal the staged path (per-stage functions + host
    combine_scores) for every combination mode."""
    rng = np.random.default_rng(11)
    n, w = 260, 100
    recons = (rng.uniform(-0.3, 0.3, (n, w)) / np.sqrt(w)).astype(np.float32)
    true = (rng.uniform(-0.3, 0.3, (n, w)) / np.sqrt(w)).astype(np.float32)
    critic = rng.standard_normal(n).astype(np.float32)
    inf = sc.InferenceOutput(recons_signal=recons, true_signal=true,
                             critic_score=critic)
    for mode in ("mult", "uncertainty", "sum", "sum_uncertainty", "critic",
                 "critic_uncertainty", "rec", "rec_uncertainty"):
        staged_rec = sc.hyperbolic_window_scores(recons, true)
        staged_critic = []
        if mode in sc.CRITIC_COMBOS:
            staged_critic = sc.final_critic_scores(critic, true)
            staged_critic = staged_critic[: staged_rec.shape[0]]
        want = sc.combine_scores(mode, staged_critic, staged_rec, recons)
        got = sc.score_anomalies_hyperbolic(inf, mode)
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-7, err_msg=mode)


def test_one_call_detection_equals_staged():
    """scorer.detect_scores (forward + scoring in ONE program) must equal
    run_inference + the staged scorers, hyperbolic and euclidean."""
    import jax

    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(12)
    X = rng.uniform(-1, 1, (300, 100)).astype(np.float32)

    # hyperbolic / uncertainty
    params = init_tadgan(jax.random.PRNGKey(3), signal_shape=100,
                         hyperbolic=True)
    inf = sc.run_inference(params, X, True)
    want = sc.score_anomalies_hyperbolic(inf, "uncertainty")
    got, got_inf = sc.detect_scores(params, X, True, "uncertainty")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_inf.recons_signal, inf.recons_signal,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_inf.critic_score, inf.critic_score,
                               rtol=1e-6, atol=1e-7)

    # euclidean / dtw mult
    params = init_tadgan(jax.random.PRNGKey(4), signal_shape=100,
                         hyperbolic=False)
    inf = sc.run_inference(params, X, False)
    want = sc.score_anomalies_euclidean(
        inf.true_signal, inf.recons_signal, inf.critic_score,
        rec_error_type="dtw", comb="mult")
    got, got_inf = sc.detect_scores(params, X, False, "mult",
                                    rec_error="dtw")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_inf.recons_signal, inf.recons_signal,
                               rtol=1e-6, atol=1e-7)


def test_one_call_detection_accepts_device_resident_windows():
    """detect_scores with a device-resident jax.Array X (no host upload)
    must produce the same scores and host-numpy inference artifacts as the
    numpy-X call."""
    import jax
    import jax.numpy as jnp

    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(21)
    X = rng.uniform(-1, 1, (300, 100)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(5), signal_shape=100,
                         hyperbolic=True)
    want, want_inf = sc.detect_scores(params, X, True, "uncertainty")
    X_dev = jax.device_put(jnp.asarray(X))
    got, got_inf = sc.detect_scores(params, X_dev, True, "uncertainty")
    np.testing.assert_array_equal(got, want)
    assert isinstance(got_inf.gt_signal, np.ndarray)
    np.testing.assert_array_equal(got_inf.gt_signal, want_inf.gt_signal)

    got_so, none_inf = sc.detect_scores(params, X_dev, True, "uncertainty",
                                        fetch_inference=False)
    assert none_inf is None
    np.testing.assert_allclose(got_so, want, rtol=1e-5, atol=1e-6)


def test_stage_inference_resident_scoring_bitwise():
    """scorer.stage_inference puts artifact tensors on device once; every
    staged scorer must then produce BITWISE the same scores as with host
    numpy inputs (the `load: true` device-resident re-scoring path,
    round 5). Covers hyperbolic, euclidean, and multivariate tails."""
    import jax

    rng = np.random.default_rng(31)
    n, w = 260, 100
    recons = (rng.uniform(-0.3, 0.3, (n, w)) / np.sqrt(w)).astype(np.float32)
    true = (rng.uniform(-0.3, 0.3, (n, w)) / np.sqrt(w)).astype(np.float32)
    critic = rng.standard_normal(n).astype(np.float32)
    inf = sc.InferenceOutput(recons_signal=recons, true_signal=true,
                             critic_score=critic)
    staged = sc.stage_inference(inf)
    assert isinstance(staged.recons_signal, jax.Array)
    assert staged.eucl_recons is None and staged.gt_signal is None
    # idempotent: already-resident tensors pass through untouched
    again = sc.stage_inference(staged)
    assert again.recons_signal is staged.recons_signal

    for mode in ("uncertainty", "mult", "rec"):
        want = sc.score_anomalies_hyperbolic(inf, mode)
        got = sc.score_anomalies_hyperbolic(staged, mode)
        np.testing.assert_array_equal(got, want, err_msg=mode)

    want = sc.score_anomalies_euclidean(true, recons, critic,
                                        rec_error_type="area", comb="mult")
    got = sc.score_anomalies_euclidean(staged.true_signal,
                                       staged.recons_signal,
                                       staged.critic_score,
                                       rec_error_type="area", comb="mult")
    np.testing.assert_array_equal(got, want)

    want = sc.score_anomalies_multivariate(inf, "mult", False)
    got = sc.score_anomalies_multivariate(staged, "mult", False)
    np.testing.assert_array_equal(got, want)


def test_artifact_dtype_and_set_options():
    """artifact_dtype='float16' halves the persisted tensors (device-side
    cast before the fetch); artifact_set='minimal' drops eucl_recons and
    gt_signal for hyperbolic runs. Returned SCORES are identical to the
    default call in every case (they are computed in f32 on device either
    way); re-scoring loaded f16 artifacts stays within f16 rounding of the
    f32 path (VERDICT r4 item 3 opt-ins)."""
    import jax

    from hypad_tpu.models.tadgan import init_tadgan

    rng = np.random.default_rng(40)
    X = rng.uniform(-1, 1, (300, 100)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(6), signal_shape=100,
                         hyperbolic=True)

    base_scores, base_inf = sc.detect_scores(params, X, True, "uncertainty")
    assert base_inf.eucl_recons is not None
    assert base_inf.gt_signal is not None

    s16, inf16 = sc.detect_scores(params, X, True, "uncertainty",
                                  artifact_dtype="float16")
    np.testing.assert_array_equal(np.asarray(s16), np.asarray(base_scores))
    assert inf16.recons_signal.dtype == np.float16
    assert inf16.eucl_recons.dtype == np.float16
    assert inf16.gt_signal.dtype == np.float16
    assert inf16.critic_score.dtype == np.float32

    smin, infmin = sc.detect_scores(params, X, True, "uncertainty",
                                    artifact_set="minimal")
    np.testing.assert_array_equal(np.asarray(smin), np.asarray(base_scores))
    assert infmin.eucl_recons is None and infmin.gt_signal is None
    np.testing.assert_array_equal(infmin.recons_signal,
                                  base_inf.recons_signal)

    # f16 artifacts re-score within rounding of the f32 artifacts
    want = sc.score_anomalies_hyperbolic(base_inf, "uncertainty")
    got = sc.score_anomalies_hyperbolic(sc.stage_inference(inf16),
                                        "uncertainty")
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    # round-trips through the npz cache
    import tempfile

    from hypad_tpu.utils import artifacts as art

    d = tempfile.mkdtemp()
    art.save_inference(d, inf16, np.arange(400))
    loaded, idx = art.load_inference(d)
    assert loaded.recons_signal.dtype == np.float16
    assert len(idx) == 400

    # config validation rejects unknown values
    import pytest

    from hypad_tpu.utils.config import load_config

    with pytest.raises(ValueError, match="artifact_dtype"):
        load_config({"artifact_dtype": "bf16"})
    with pytest.raises(ValueError, match="artifact_set"):
        load_config({"artifact_set": "tiny"})


def test_device_fetch_streams_to_identical_npz():
    """fetch_inference='device' leaves the tensors on device and
    artifacts.save_inference streams them (fetch of member i overlapping
    the write of member i-1, round 5) — the resulting npz must load to
    the SAME arrays as the host-fetched path, and the detector path using
    it stays byte-equivalent at the score level."""
    import os
    import tempfile

    import jax

    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.utils import artifacts as art

    rng = np.random.default_rng(41)
    X = rng.uniform(-1, 1, (300, 100)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(6), signal_shape=100,
                         hyperbolic=True)

    host_scores, host_inf = sc.detect_scores(params, X, True, "uncertainty")
    dev_scores, dev_inf = sc.detect_scores(params, X, True, "uncertainty",
                                           fetch_inference="device")
    np.testing.assert_array_equal(np.asarray(dev_scores),
                                  np.asarray(host_scores))
    assert isinstance(dev_inf.recons_signal, jax.Array)

    d_host, d_dev = tempfile.mkdtemp(), tempfile.mkdtemp()
    art.save_inference(d_host, host_inf, np.arange(400))
    art.save_inference(d_dev, dev_inf, np.arange(400))
    lh, ih = art.load_inference(d_host)
    ld, idx = art.load_inference(d_dev)
    assert len(idx) == 400 and np.array_equal(idx, ih)
    for name in lh._fields:
        a, b = getattr(lh, name), getattr(ld, name)
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
    # no stray tmp file left behind (atomic write)
    assert not any(f.endswith(".tmp") for f in os.listdir(d_dev))
