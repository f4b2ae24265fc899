"""Detection artifact cache (aux subsystem; SURVEY.md §5).

Behavior spec: the reference persists every detection intermediate —
reconstructions, ground truth, critic scores, index, hyperbolic variants
(anomaly_detection.py:115-131) and the per-error-type score pickles
(utils/anomaly_detection_utils.py:229-238,:508-550) — and reloads them when
``params.load`` is set, so scoring variants can be re-run on frozen
embeddings without re-running the model. Same capability here with .npz
(no pickled tensors needed).
"""

from __future__ import annotations

import os

import numpy as np

from hypad_tpu.detect.scorer import InferenceOutput

_FILE = "inference.npz"


def save_inference(path, out: InferenceOutput, true_index=None):
    """Persist the inference tensors UNCOMPRESSED: zlib on float32 model
    outputs compresses poorly and costs far more than it saves on this
    1-core host — measured 7.3 s savez_compressed vs 1.3 s savez for the
    24 MB hyperbolic artifact set at 20k windows (round 4), which made
    compression the single largest cost of the reference-default
    ``save_artifacts: true`` detection path. ``np.load`` reads both
    formats, so caches written by earlier versions still load."""
    os.makedirs(path, exist_ok=True)
    arrays = {k: v for k, v in out._asdict().items() if v is not None}
    if true_index is not None:
        arrays["true_index"] = np.asarray(true_index)
    np.savez(os.path.join(path, _FILE), **arrays)


def load_inference(path):
    """Returns (InferenceOutput, true_index) or None if absent."""
    f = os.path.join(path, _FILE)
    if not os.path.exists(f):
        return None
    data = np.load(f)
    fields = {k: data[k] for k in data.files if k != "true_index"}
    true_index = data["true_index"] if "true_index" in data.files else None
    return InferenceOutput(**fields), true_index


def cache_scores(path, name, compute_fn, enabled=True):
    """Score-pickle equivalent: compute once, reuse on later runs
    (reference :229-238). ``name``: e.g. 'critic_scores', 'point', 'dtw'."""
    f = os.path.join(path, f"{name}.npy")
    if enabled and os.path.exists(f):
        return np.load(f)
    scores = np.asarray(compute_fn())
    if enabled:
        os.makedirs(path, exist_ok=True)
        np.save(f, scores)
    return scores
