"""Evaluation: contextual (interval-overlap) confusion matrix and metrics.

Behavior spec: reference ``contextual_confusion_matrix(weighted=False)``
(utils/anomaly_detection_utils.py:606-654) with ``_overlap_segment``
(:579-599): each ground-truth interval is a TP if any predicted interval
overlaps it (strict product test, :301-304), else FN; predictions matched to
no ground truth are FPs; intervals are end-padded by +1 (:602-603); TN is
undefined (None). ``compute_metrics`` (:241-254) prints
precision/recall/F1/gmean.

The reference's ``weighted=True`` path calls two functions that do not exist
anywhere in the repo (``_weighted_segment``/``_contextual_partition`` — a
latent NameError, :634-635); here it raises ``NotImplementedError``
explicitly with the same effective behavior, documented instead of silently
"fixed" (SURVEY.md "bugs to preserve-or-document").
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _pad(intervals):
    return [(part[0], part[1] + 1) for part in intervals]


def _overlap_segment(expected, observed):
    """Set-matching counts (reference :579-599): a GT interval is one TP if
    any prediction overlaps it (FN otherwise); a prediction is an FP only if
    it overlaps no GT interval. A prediction overlapping several GT intervals
    is consumed once; a GT interval hit by several predictions is still one
    TP.

    One pairwise (n_expected, n_observed) overlap matrix instead of the
    reference's nested Python loops; the reference's strict overlap test is
    ``(e_start - o_end) * (e_end - o_start) < 0`` (:301-304)."""
    if not expected or not observed:
        return None, len(observed), len(expected), 0
    exp = np.asarray(expected, dtype=np.float64)
    obs = np.asarray(observed, dtype=np.float64)
    ov = ((exp[:, 0, None] - obs[None, :, 1])
          * (exp[:, 1, None] - obs[None, :, 0]) < 0)
    tp = int(ov.any(axis=1).sum())
    fn = len(exp) - tp
    fp = int((~ov.any(axis=0)).sum())
    return None, fp, fn, tp


def _interval_rows(intervals):
    """Normalize an interval collection to a list of (start, end) tuples:
    accepts a list of pairs, an (k, >=2) ndarray (find_anomalies output —
    extra columns like the score are ignored), or a start/end DataFrame."""
    if isinstance(intervals, list):
        return intervals
    if isinstance(intervals, np.ndarray):
        return ([] if intervals.size == 0
                else [(row[0], row[1]) for row in intervals])
    return list(intervals[["start", "end"]].itertuples(index=False))


def contextual_confusion_matrix(expected, observed, data=None, start=None,
                                end=None, weighted=False):
    """Returns (tn, fp, fn, tp); tn is always None for the overlap method."""
    if weighted:
        raise NotImplementedError(
            "weighted segment evaluation is not implemented (the reference's "
            "weighted=True path NameErrors on undefined helpers, "
            "utils/anomaly_detection_utils.py:634-635)"
        )
    if data is not None:
        start = data["timestamp"].min()
        end = data["timestamp"].max()
    expected = _pad(_interval_rows(expected))
    observed = _pad(_interval_rows(observed))
    return _overlap_segment(expected, observed)


def metrics_from_confusion(confusion, verbose=True):
    """Precision/recall/F1/gmean from an already-computed overlap confusion
    matrix — lets callers that need both the counts and the metrics compute
    the (pairwise-overlap) matrix once. Raises ZeroDivisionError like the
    reference when there are no predictions (:105-113 excusal contract)."""
    tn, fp, fn, tp = confusion
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * (precision * recall) / (precision + recall)
    gmean = float(np.sqrt(precision * recall))
    if verbose:
        print(f"precision: {precision}, recall: {recall}")
        print(f"f1_score: {f1}, gmean: {gmean}")
    return {"tn": tn, "fp": fp, "fn": fn, "tp": tp,
            "precision": precision, "recall": recall, "f1": f1,
            "gmean": gmean}


def compute_metrics(known_anomalies, pred_anomalies, verbose=True):
    """Precision/recall/F1/gmean from the overlap confusion matrix
    (reference compute_metrics, :241-254). Returns a dict; raises
    ZeroDivisionError like the reference when there are no predictions."""
    return metrics_from_confusion(
        contextual_confusion_matrix(known_anomalies, pred_anomalies,
                                    weighted=False), verbose=verbose)


def pointwise_scores(y_true, y_predict, verbose=True):
    """Pointwise accuracy/precision/recall/F1 (reference find_scores,
    :1475-1498; kept for capability parity)."""
    y_true = np.asarray(y_true).astype(int)
    y_predict = np.asarray(y_predict).astype(int)
    tp = int(np.sum((y_true == 1) & (y_predict == 1)))
    tn = int(np.sum((y_true == 0) & (y_predict == 0)))
    fp = int(np.sum((y_true == 0) & (y_predict == 1)))
    fn = int(np.sum((y_true == 1) & (y_predict == 0)))
    acc = (tp + tn) / len(y_true)
    try:
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        f1 = 2 * precision * recall / (precision + recall)
    except ZeroDivisionError:
        precision = recall = f1 = 0.0
    if verbose:
        print(f"Accuracy {acc:.2f}")
        print(f"Precision {precision:.2f}")
        print(f"Recall {recall:.2f}")
        print(f"F1 Score {f1:.2f}")
    return {"accuracy": acc, "precision": precision, "recall": recall,
            "f1": f1}


def results_row(signal, confusion):
    """Row for the cumulative results CSV (reference :115-126):
    columns signal,tn,fp,fn,tp."""
    tn, fp, fn, tp = confusion
    return pd.DataFrame([[signal, tn, fp, fn, tp]],
                        columns=["signal", "tn", "fp", "fn", "tp"])
