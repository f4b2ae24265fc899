"""Detector orchestration (layer L5 top): inference -> scores -> intervals
-> metrics -> reports.

Behavior spec: reference ``test_tadgan`` (anomaly_detection.py:20-155) +
``univariate_anomaly_detection`` (utils/anomaly_detection_utils.py:21-126) +
``multivariate_anomaly_detection`` (:129-222):

  * ground truth: Yahoo known-anomalies CSV / data/anomalies.csv loader /
    multivariate tensor labels;
  * batched eval forward collecting reconstructions + critic scores
    (+ MobiusLinear-embedded inputs when hyperbolic);
  * artifact save/reload gated on ``params.load``;
  * scoring per SURVEY §3.4, intervals via find_anomalies (0.33/0.1 windows
    univariate with fixed threshold; 0.2/0.1 and padding 200 multivariate);
  * contextual confusion matrix + metric prints; optional cumulative results
    CSV ./results/{filename} with columns signal,tn,fp,fn,tp (:115-126).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from hypad_tpu.data.pipeline import load_anomalies
from hypad_tpu.detect import intervals as iv
from hypad_tpu.detect import metrics as mt
from hypad_tpu.detect import scorer as sc
from hypad_tpu.utils import artifacts


def detect(params, state_params, test_data, run_path, read_path="",
           known_anomalies=None, save_plots=None, mesh=None,
           precomputed_scores=None):
    """Full detection pass. Returns a result dict with scores, intervals and
    metrics (None metrics when no ground truth / no predictions).

    ``mesh``: optional dp mesh — inference and the device scoring stages are
    sharded over the window axis across all mesh devices (SURVEY §2.3
    scoring parallelism); results are identical to single-device scoring
    (tests/test_sharded_scoring.py).

    ``save_plots``: None = reference behavior (anomaly overlay plot saved
    for multivariate runs, utils/anomaly_detection_utils.py:220; none for
    univariate); True/False overrides either way (``save_plots`` config
    key).

    ``precomputed_scores``: final per-signal scores computed elsewhere
    (the fleet detector, scorer.detect_scores_fleet — univariate or
    multivariate) — the device compute is skipped entirely and only the
    host epilogue (intervals, metrics, CSV, plots) runs. Mutually
    exclusive with ``params.load`` artifact reuse and artifact
    persistence."""
    os.makedirs(run_path, exist_ok=True)

    # multivariate dispatch: the reference keys on signal == 'multivariate'
    # (anomaly_detection.py:32,:137) — which its SWAT/WADI configs set, but
    # CASAS-family runs need ``signal`` as the point/resident name for data
    # paths (utils/data.py:302-317), leaving their detection dispatch broken
    # in the reference. We additionally key on the dataset family so CASAS/
    # ELINUS/eHealth runs take the multivariate path (documented extension).
    from hypad_tpu.data.registry import MULTIVARIATE_DATASETS

    is_mv = (params.signal == "multivariate"
             or params.dataset in MULTIVARIATE_DATASETS)

    # ---- ground truth (anomaly_detection.py:31-37)
    if known_anomalies is None:
        if is_mv:
            known_anomalies = _multivariate_ground_truth(test_data)
        elif params.dataset in ("A1", "A2", "A3", "A4"):
            known_anomalies = test_data.known_anomalies
        else:
            known_anomalies = load_anomalies(params.signal, params.data_root)

    # ---- inference (cached when params.load; anomaly_detection.py:53-61)
    # Fresh runs take the ONE-CALL path: forward + full scoring in a single
    # device program (scorer.detect_scores), univariate and multivariate
    # alike. Cached re-runs use the staged functions on the stored tensors.
    if precomputed_scores is not None:
        final_scores = np.asarray(precomputed_scores)
        if is_mv:
            # the fleet's multivariate slice: per-timestep scores, the
            # reference mv interval parameters (see _MV_FA_KW)
            true_index = np.arange(len(final_scores))
            intervals = iv.find_anomalies(final_scores.reshape(-1),
                                          true_index, **_MV_FA_KW)
        else:
            true_index = np.asarray(test_data.index)
            intervals = _univariate_intervals(final_scores, true_index)
        return _host_epilogue(params, final_scores, intervals,
                              known_anomalies, run_path, save_plots, is_mv,
                              true_index)

    one_call_scores = None
    save_artifacts = getattr(params, "save_artifacts", True) or params.load
    cached = artifacts.load_inference(run_path) if params.load else None
    if cached is not None:
        inference, true_index = cached
        # stage the cached tensors on device ONCE: every scoring program
        # below then runs device-resident instead of re-uploading the
        # artifact set per call (round 4 measured the upload-paying staged
        # path at ~4% of one-call throughput; scores are bitwise identical)
        inference = sc.stage_inference(inference, mesh=mesh)
    else:
        # stage the windows on device ONCE and keep them resident on the
        # dataset object: the warm detection path is transfer-bound through
        # a tunneled backend (~130ms of a 224ms call at 20k windows), and
        # for unique_dataset/Yahoo train->detect runs the CLI already put
        # the very same windows on device for training (cli.cmd_train)
        X_dev = getattr(test_data, "X_device", None)
        if X_dev is None and len(test_data.X) <= sc.ONE_CALL_MAX_WINDOWS:
            # (beyond the one-call limit the scorer falls back to chunked
            # host-batched inference — staging everything up front would
            # only add a wasted round trip)
            import jax.numpy as jnp

            X_dev = jnp.asarray(np.asarray(test_data.X, np.float32))
            try:
                test_data.X_device = X_dev
            except AttributeError:
                pass  # dataset objects without assignable attrs still work
        one_call_scores, inference = sc.detect_scores(
            state_params, X_dev if X_dev is not None else test_data.X,
            params.hyperbolic,
            params.combination, rec_error=params.rec_error, mesh=mesh,
            # "device" (streamed member-wise fetch+write) measured SLOWER
            # than one batched host fetch at f32 through the tunnel
            # (PROFILE.md round-5 notes) — the batched get stays the default
            fetch_inference=save_artifacts,
            multivariate=is_mv,
            X_host=test_data.X,
            artifact_dtype=getattr(params, "artifact_dtype", "float32"),
            artifact_set=getattr(params, "artifact_set", "full"))
        # the reference's true_index is the FULL aggregated timeline
        # (SignalDataset.index, anomaly_detection.py:133 via __getitem__'s
        # second element), length n_buckets = N + W — it must cover all
        # T = N + W - 1 unrolled score positions, not just window starts
        true_index = np.asarray(test_data.index)
        if save_artifacts:
            artifacts.save_inference(run_path, inference, true_index)

    # ---- scores (cached per combination/rec_error when params.load, the
    # score-pickle equivalent of utils/anomaly_detection_utils.py:229-238)
    if is_mv:
        compute = lambda: sc.score_anomalies_multivariate(  # noqa: E731
            inference, params.combination, params.hyperbolic, mesh=mesh)
        if one_call_scores is not None:
            compute = lambda: one_call_scores  # noqa: E731
        final_scores = artifacts.cache_scores(
            run_path, f"scores_mv_{params.combination}", compute,
            enabled=params.load)
        intervals = iv.find_anomalies(
            np.asarray(final_scores).reshape(-1),
            np.arange(len(final_scores)), **_MV_FA_KW)
    else:
        if params.hyperbolic:
            compute = lambda: sc.score_anomalies_hyperbolic(  # noqa: E731
                inference, params.combination, mesh=mesh)
            cache_key = f"scores_hyper_{params.combination}"
        else:
            # the euclidean score_anomalies only knows mult/sum/rec/critic
            # and raises on anything else (:566-570) — loud, like the
            # reference, rather than silently remapping
            compute = lambda: sc.score_anomalies_euclidean(  # noqa: E731
                inference.true_signal, inference.recons_signal,
                inference.critic_score, rec_error_type=params.rec_error,
                comb=params.combination, mesh=mesh)
            cache_key = (f"scores_eucl_{params.rec_error}_"
                         f"{params.combination}")
        if one_call_scores is not None:
            compute = lambda: one_call_scores  # noqa: E731
        final_scores = artifacts.cache_scores(run_path, cache_key, compute,
                                              enabled=params.load)
        intervals = _univariate_intervals(np.asarray(final_scores),
                                          true_index)

    return _host_epilogue(params, final_scores, intervals, known_anomalies,
                          run_path, save_plots, is_mv, true_index)


def detect_grid(params, state_params, test_data, run_path, read_path="",
                rec_errors=None, combinations=None, known_anomalies=None,
                mesh=None, precomputed_grid=None):
    """Grid detection: every (rec_error x combination) cell scored from ONE
    device program (scorer.detect_scores_grid), then each cell's host
    epilogue (intervals -> confusion -> metrics) and one cumulative
    ``grid_results.csv`` in the run dir.

    Replaces the reference's sweep workflow (README.md:87-89): re-running
    ``anomaly_detection.py`` once per (rec_error, combination) with
    ``load: true`` artifact reuse — one process start + full scoring
    dispatch per cell. Here the grid is one compiled program and one
    transfer; each cell adds only its ~ms host epilogue.

    Returns ``{(rec_error|None, combination): result_dict}`` with the same
    per-cell result shape as ``detect`` (scores, intervals, confusion,
    metrics).

    ``precomputed_grid``: optional ``{(rec_error|None, comb): scores}`` dict
    (one signal's slice of ``detect_scores_fleet_grid``) — the device
    program is then skipped and only the host epilogues + CSV run (the
    ``sweep --rec-errors/--combinations`` path)."""
    os.makedirs(run_path, exist_ok=True)
    from hypad_tpu.data.registry import MULTIVARIATE_DATASETS

    is_mv = (params.signal == "multivariate"
             or params.dataset in MULTIVARIATE_DATASETS)

    if known_anomalies is None:
        if is_mv:
            known_anomalies = _multivariate_ground_truth(test_data)
        elif params.dataset in ("A1", "A2", "A3", "A4"):
            known_anomalies = test_data.known_anomalies
        else:
            known_anomalies = load_anomalies(params.signal, params.data_root)

    if combinations is None:
        combinations = [params.combination]
    if rec_errors is None:
        rec_errors = [params.rec_error]

    if precomputed_grid is not None:
        grid = precomputed_grid
    else:
        X = getattr(test_data, "X_device", None)
        if X is None:
            X = test_data.X
        grid = sc.detect_scores_grid(state_params, X, params.hyperbolic,
                                     combinations, rec_errors=rec_errors,
                                     mesh=mesh, multivariate=is_mv)

    # interval extraction for ALL cells in one vectorized batch — one grid's
    # cells share a score length by construction (per-window hyperbolic /
    # unrolled euclidean / per-timestep multivariate), and at benchmark-grid
    # scale the serial per-cell epilogue was the measured frontier
    # (intervals.find_anomalies_batch; bitwise per cell vs find_anomalies)
    cells = list(grid.keys())
    score_matrix = np.stack([np.asarray(grid[c]).reshape(-1) for c in cells])
    if is_mv:
        true_index = np.arange(score_matrix.shape[1])
        all_intervals = iv.find_anomalies_batch(score_matrix, true_index,
                                                **_MV_FA_KW)
    else:
        true_index = np.asarray(test_data.index)
        all_intervals = iv.find_anomalies_batch(score_matrix, true_index,
                                                **_UNIVARIATE_FA_KW)

    rows = []
    results = {}
    for (re_, cb), scores, intervals in zip(cells, score_matrix,
                                            all_intervals):
        confusion, metrics = _confusion_and_metrics(
            known_anomalies, intervals, verbose=False)
        results[(re_, cb)] = {"scores": scores, "intervals": intervals,
                              "confusion": confusion, "metrics": metrics}
        cell = cb if re_ is None else f"{re_}/{cb}"
        m = metrics or {}
        rows.append({"rec_error": re_ or "", "combination": cb,
                     "tn": confusion[0], "fp": confusion[1],
                     "fn": confusion[2], "tp": confusion[3],
                     **{k: round(float(m[k]), 6) for k in
                        ("precision", "recall", "f1", "gmean") if k in m}})
        f1 = f"f1={m['f1']:.4f}" if "f1" in m else "no metrics"
        print(f"[grid] {cell}: {f1} "
              f"(tp={confusion[3]} fp={confusion[1]} fn={confusion[2]})")
    pd.DataFrame(rows).to_csv(os.path.join(run_path, "grid_results.csv"),
                              index=False)
    return results


def _pred_frame(intervals):
    """Interval list -> the reference's prediction DataFrame shape (empty
    predictions keep the column schema)."""
    return (pd.DataFrame(intervals, columns=["start", "end", "score"])
            if len(intervals) else
            pd.DataFrame(columns=["start", "end", "score"]))


def _confusion_and_metrics(known_anomalies, pred, verbose=True):
    """Confusion matrix + metrics with the reference's excusal semantics,
    shared by the single-cell epilogue and the grid cells so they cannot
    diverge.

    ZeroDivisionError is the only failure the reference's bare except
    legitimately excuses: empty predictions / no ground truth -> undefined
    precision/recall (utils/anomaly_detection_utils.py:105-113). Anything
    else is a real regression in the metrics path and must propagate, not
    be silently reported as confusion=[0,0,0,0].

    ``pred`` may be a start/end DataFrame or the raw find_anomalies
    interval array. The (pairwise-overlap) confusion matrix is computed
    once and the metrics derived from it — at grid scale the doubled
    matrix was a measured share of the per-cell epilogue."""
    try:
        confusion = mt.contextual_confusion_matrix(known_anomalies, pred,
                                                   weighted=False)
        metrics = mt.metrics_from_confusion(confusion, verbose=verbose)
        return confusion, metrics
    except ZeroDivisionError:
        return [0, 0, 0, 0], None


# the reference's fixed interval-extraction parameters, ONE definition for
# the single-cell, fleet, and batched-grid paths so a tuning change cannot
# diverge them: univariate = anomaly_detection.py:64-69 (0.33/0.1 windows,
# fixed threshold); multivariate = utils/anomaly_detection_utils.py:206-213
# (0.2/0.1 windows, padding 200)
_UNIVARIATE_FA_KW = dict(window_size_portion=0.33,
                         window_step_size_portion=0.1, fixed_threshold=True)
_MV_FA_KW = dict(window_size_portion=0.2, window_step_size_portion=0.1,
                 fixed_threshold=True, anomaly_padding=200)


def _univariate_intervals(final_scores, true_index):
    """Univariate interval extraction (see _UNIVARIATE_FA_KW)."""
    return iv.find_anomalies(final_scores.reshape(-1), true_index,
                             **_UNIVARIATE_FA_KW)


def _host_epilogue(params, final_scores, intervals, known_anomalies,
                   run_path, save_plots, is_mv, true_index):
    """Metrics + reports tail shared by the device path and the fleet
    (precomputed-scores) path.

    Reference wraps the confusion matrix in try/except: empty predictions
    -> zeros."""
    result = {
        "scores": np.asarray(final_scores),
        "intervals": intervals,
        "confusion": (0, 0, 0, 0),
        "metrics": None,
    }
    pred_anomalies = _pred_frame(intervals)
    pred_anomalies.to_csv(os.path.join(run_path, "anomalies.csv"))
    confusion, metrics = _confusion_and_metrics(known_anomalies,
                                                pred_anomalies)
    result["confusion"] = confusion
    result["metrics"] = metrics

    # ---- cumulative results CSV (:115-126)
    if params.save_result:
        _append_results_csv(params, result["confusion"])

    if save_plots is None:
        save_plots = is_mv
    if save_plots:
        from hypad_tpu.utils.plotting import plot_anomaly_intervals

        try:
            plot_anomaly_intervals(
                [pred_anomalies] + ([known_anomalies]
                                    if known_anomalies is not None and
                                    len(known_anomalies) else []),
                np.arange(len(final_scores)) if is_mv else true_index,
                np.asarray(final_scores), run_path)
        except ImportError:  # matplotlib is the optional 'plots' extra
            print("save_plots requested but matplotlib is not installed "
                  "(pip install 'hypad-tpu[plots]'); skipping plot")

    return result


def _multivariate_ground_truth(test_data):
    """Reference multivariate GT formatting: ``casas_anomalies`` run
    extraction with its off-by-one end index and dropped trailing run
    (utils/anomaly_detection_utils.py:279-298)."""
    y = getattr(test_data, "y", None)
    if y is None:
        return pd.DataFrame(columns=["start", "end"])
    from hypad_tpu.data.fetch import casas_anomalies

    y = np.asarray(y).reshape(-1)[: len(test_data.X)]
    return casas_anomalies(y, np.arange(len(y)))


def _append_results_csv(params, confusion):
    results_dir = os.path.join(params.output_root, "results")
    os.makedirs(results_dir, exist_ok=True)
    file_place = os.path.join(results_dir, params.filename or "results.csv")
    if os.path.isfile(file_place):
        res = pd.read_csv(file_place)
    else:
        res = pd.DataFrame(columns=["signal", "tn", "fp", "fn", "tp"])
    if params.signal not in list(res["signal"]):
        res.loc[len(res)] = [params.signal] + list(confusion)
        res.to_csv(file_place, index=False)
