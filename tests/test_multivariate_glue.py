"""Multivariate detection glue parity: identical synthetic model outputs fed
through the reference's multivariate_anomaly_detection and through our
scoring + interval + GT chain must produce the same intervals and metrics."""

import io
import os
import re
import contextlib
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from hypad_tpu.data.fetch import casas_anomalies
from hypad_tpu.detect import intervals as iv
from hypad_tpu.detect import metrics as mt
from hypad_tpu.detect import scorer as sc
from hypad_tpu.detect.scorer import InferenceOutput
from reference_oracle import load_reference_adu


@pytest.fixture(scope="module")
def synthetic():
    rng = np.random.default_rng(0)
    N, F = 600, 20
    true = rng.uniform(-1, 1, (N, F))
    recons = true + 0.05 * rng.standard_normal((N, F))
    recons[300:330] += 1.5  # reconstruction blow-up = anomaly
    critic = rng.standard_normal(N)
    y = np.zeros((N, 1))
    y[295:335] = 1
    return true, recons, critic, y


def _run_reference(adu, true, recons, critic, y, tmp_path, combination):
    params = SimpleNamespace(dataset="SWAT", signal="multivariate",
                             hyperbolic=False, signal_shape=true.shape[1],
                             id=1, load=False)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        import torch

        gt_dir = os.path.join("data", "DATASETS", "SWAT", "POINTS",
                              "multivariate")
        os.makedirs(gt_dir, exist_ok=True)
        torch.save(torch.tensor(y.reshape(-1, 1, 1)),
                   os.path.join(gt_dir,
                                "multivariate_groundtruth_id1.pt"))
        out_dir = str(tmp_path / "refout") + "/"
        os.makedirs(out_dir, exist_ok=True)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            adu.multivariate_anomaly_detection(
                recons, true, params, combination, critic, out_dir)
        text = buf.getvalue()
        preds = pd.read_csv(os.path.join(out_dir, "pred_anomalies.csv"))
        m = re.search(r"precision: ([0-9.]+), recall: ([0-9.]+)", text)
        return preds, (float(m.group(1)), float(m.group(2))) if m else None
    finally:
        os.chdir(cwd)


def test_multivariate_euclidean_matches_reference(tmp_path, synthetic):
    adu = load_reference_adu()
    true, recons, critic, y = synthetic

    ref_preds, ref_pr = _run_reference(adu, true, recons, critic, y,
                                       tmp_path, "rec")

    inference = InferenceOutput(recons_signal=recons, true_signal=true,
                                critic_score=critic)
    scores = sc.score_anomalies_multivariate(inference, "rec",
                                             hyperbolic=False)
    intervals = iv.find_anomalies(
        np.asarray(scores).reshape(-1), np.arange(len(scores)),
        window_size_portion=0.2, window_step_size_portion=0.1,
        fixed_threshold=True, anomaly_padding=200)

    # the reference maps positions through its synthetic per-second
    # timestamp index; ours uses positions directly — compare positions
    assert len(intervals) == len(ref_preds)
    # reference start/end are epoch seconds starting 2012-11-24; recover
    # positions by rank order of the synthetic index
    import datetime

    t0 = datetime.datetime(2012, 11, 24).timestamp()
    ref_starts = (ref_preds["start"].values - t0).astype(int)
    ref_ends = (ref_preds["end"].values - t0).astype(int)
    np.testing.assert_array_equal(intervals[:, 0].astype(int), ref_starts)
    np.testing.assert_array_equal(intervals[:, 1].astype(int), ref_ends)

    # metrics through casas_anomalies GT
    known = casas_anomalies(y, np.arange(len(scores)))
    pred_df = pd.DataFrame(intervals, columns=["start", "end", "score"])
    metrics = mt.compute_metrics(known, pred_df, verbose=False)
    if ref_pr is not None:
        assert (round(metrics["precision"], 6),
                round(metrics["recall"], 6)) == (round(ref_pr[0], 6),
                                                 round(ref_pr[1], 6))


@pytest.mark.parametrize("hyperbolic", [False, True])
def test_multivariate_one_call_matches_staged(synthetic, hyperbolic):
    """detect_scores(multivariate=True) — forward + mv scoring in ONE
    program — must equal the staged run_inference +
    score_anomalies_multivariate path, with and without the dp mesh and in
    the scores-only (fetch_inference=False) mode."""
    import jax

    from hypad_tpu.models.tadgan import init_tadgan
    from hypad_tpu.parallel.mesh import make_mesh

    true, _, _, _ = synthetic
    F = true.shape[1]
    params = init_tadgan(jax.random.PRNGKey(3), signal_shape=F,
                         hyperbolic=hyperbolic)
    comb = "mult" if hyperbolic else "rec"

    inference = sc.run_inference(params, true, hyperbolic)
    staged = sc.score_anomalies_multivariate(inference, comb, hyperbolic)

    one_call, inf2 = sc.detect_scores(params, true, hyperbolic, comb,
                                      multivariate=True)
    np.testing.assert_allclose(one_call, staged, rtol=0, atol=2e-5)
    np.testing.assert_allclose(inf2.recons_signal, inference.recons_signal,
                               rtol=0, atol=1e-6)

    scores_only, none_inf = sc.detect_scores(params, true, hyperbolic, comb,
                                             multivariate=True,
                                             fetch_inference=False)
    assert none_inf is None
    # dropping the inference outputs changes XLA's fusion choices; the
    # scores agree to float32 round-off, not bitwise
    np.testing.assert_allclose(scores_only, one_call, rtol=1e-5, atol=1e-6)

    mesh = make_mesh("all")
    sharded, _ = sc.detect_scores(params, true, hyperbolic, comb, mesh=mesh,
                                  multivariate=True)
    # cross-device reductions (zscore mean/std) reorder float sums
    np.testing.assert_allclose(sharded, staged, rtol=1e-4, atol=1e-6)


def test_multivariate_critic_combination_matches(tmp_path, synthetic):
    adu = load_reference_adu()
    true, recons, critic, y = synthetic
    ref_preds, _ = _run_reference(adu, true, recons, critic, y, tmp_path,
                                  "mult")

    inference = InferenceOutput(recons_signal=recons, true_signal=true,
                                critic_score=critic)
    scores = sc.score_anomalies_multivariate(inference, "mult",
                                             hyperbolic=False)
    intervals = iv.find_anomalies(
        np.asarray(scores).reshape(-1), np.arange(len(scores)),
        window_size_portion=0.2, window_step_size_portion=0.1,
        fixed_threshold=True, anomaly_padding=200)
    import datetime

    t0 = datetime.datetime(2012, 11, 24).timestamp()
    assert len(intervals) == len(ref_preds)
    np.testing.assert_array_equal(
        intervals[:, 0].astype(int),
        (ref_preds["start"].values - t0).astype(int))
