"""Config system: flat YAML -> namespace (layer L6).

Behavior spec: reference ``main.py:24-27`` / ``anomaly_detection.py:168-171``
load the YAML into an argparse.Namespace; the schema is the key set of
``configs/univariate.yaml:1-21`` (dataset, signal, epochs, hyperbolic,
signal_shape, lr, batch_size, save_result, filename, rec_error, combination,
interval, unique_dataset, resume, resume_epoch, load, new_features, id,
split); the multivariate config drops interval/unique_dataset
(``configs/multivariate.yaml``). One hardcoded override:
``latent_space_dim = 20`` (train.py:413).

Extensions (documented, defaulted so reference configs load unchanged):
  * data_root   — directory holding the datasets (reference hardcodes ./data)
  * output_root — where trained_models/ and results/ are created
  * seed        — RNG seed for the whole run
  * devices     — 'all' (data-parallel over every visible device) or an int
"""

from __future__ import annotations

import argparse
import os

import yaml

DEFAULTS = {
    "dataset": "MSL",
    "signal": "C-2",
    "epochs": 40,
    "hyperbolic": True,
    "signal_shape": 100,
    "lr": 0.0005,
    "batch_size": 64,
    "save_result": False,
    "filename": "",
    "rec_error": "dtw",
    "combination": "mult",
    "interval": 21600,
    "unique_dataset": False,
    "resume": False,
    "resume_epoch": 10,
    "load": False,
    "new_features": False,
    "id": 1,
    "split": 1,
    # extensions
    "data_root": "./data",
    "output_root": ".",
    "seed": 0,
    "devices": "all",
    # the reference always persists the inference tensors
    # (anomaly_detection.py:116-131); setting this False skips that (and
    # their device->host transfer, ~3x faster warm detection) — opt-in
    # divergence, incompatible with load: True
    "save_artifacts": True,
    # "float32" = reference parity. "float16" halves the persisted bytes
    # AND the device->host transfer of the big (N, W) inference tensors
    # (the measured bulk of the save_artifacts detection cost through a
    # tunneled backend) — opt-in divergence: cached re-scoring then runs
    # on f16-rounded embeddings (critic scores stay f32; scores from a
    # fresh run are unaffected)
    "artifact_dtype": "float32",
    # False = the default XLA critic step (bitwise-stable vs the parity
    # studies). "full" runs each critic step's entire body — generator
    # forwards + both critics' WGAN-GP value_and_grad — as ONE hand-derived
    # Pallas kernel (train/critic_kernel.py; measured 1.39x the hyperbolic
    # epoch on v5e). True = critics-only fusion. Numerically equivalent,
    # not bitwise; single-device only. Sequential training only: at fleet
    # scale (sweep) it measured ~9% SLOWER than the default step (vmapped
    # XLA already batches all S signals into single kernels; PROFILE.md)
    "fused_critics": False,
    # "full" = reference parity (persist eucl_recons + gt_signal for
    # hyperbolic runs, anomaly_detection.py:116-131). "minimal" drops
    # those two from the transfer+file: the hyperbolic scoring variants
    # never read them, so load: true re-scoring of hyperbolic combinations
    # still works; only euclidean re-scoring of a hyperbolic run's
    # artifacts needs "full"
    "artifact_set": "full",
    # None = reference behavior: anomaly overlay plot saved for
    # multivariate runs only (utils/anomaly_detection_utils.py:220);
    # True/False force it either way
    "save_plots": None,
}

VALID_COMBINATIONS = ("sum", "mult", "uncertainty", "critic",
                      "critic_uncertainty", "sum_uncertainty", "rec",
                      "rec_uncertainty")
VALID_REC_ERRORS = ("point", "area", "dtw")


def load_config(path_or_dict) -> argparse.Namespace:
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f)
    cfg = dict(DEFAULTS)
    cfg.update(raw or {})
    cfg["latent_space_dim"] = 20  # hardcoded by the reference (train.py:413)
    ns = argparse.Namespace(**cfg)
    validate(ns)
    return ns


EUCLIDEAN_COMBINATIONS = ("mult", "sum", "rec", "critic")


def validate(params):
    if getattr(params, "artifact_dtype", "float32") not in ("float32",
                                                            "float16"):
        raise ValueError("artifact_dtype must be 'float32' or 'float16', "
                         f"got {params.artifact_dtype!r}")
    if getattr(params, "fused_critics", False) not in (False, True, "full"):
        raise ValueError("fused_critics must be false, true, or 'full', "
                         f"got {params.fused_critics!r}")
    if getattr(params, "artifact_set", "full") not in ("full", "minimal"):
        raise ValueError("artifact_set must be 'full' or 'minimal', "
                         f"got {params.artifact_set!r}")
    if params.combination not in VALID_COMBINATIONS:
        raise ValueError(
            f"combination {params.combination!r} not in {VALID_COMBINATIONS}")
    if (not params.hyperbolic
            and params.signal != "multivariate"
            and params.combination not in EUCLIDEAN_COMBINATIONS):
        # fail fast: the euclidean detector raises on these AFTER training
        # (reference score_anomalies :566-570); reject at config time instead
        raise ValueError(
            f"combination {params.combination!r} requires hyperbolic: true "
            f"(euclidean supports {EUCLIDEAN_COMBINATIONS})")
    if params.rec_error not in VALID_REC_ERRORS:
        raise ValueError(
            f"rec_error {params.rec_error!r} not in {VALID_REC_ERRORS}")
    if params.batch_size <= 0 or params.epochs < 0:
        raise ValueError("batch_size must be positive and epochs >= 0")


def run_dir(params) -> str:
    """Model/run directory, reference naming convention (train.py:428-437):
    trained_models/models_{hyper|eucl}_{dataset}_{epochs}_{lr}/{dataset}
    [/{signal} unless multivariate]."""
    geo = "hyper" if params.hyperbolic else "eucl"
    base = os.path.join(
        params.output_root, "trained_models",
        f"models_{geo}_{params.dataset}_{params.epochs}_{params.lr}",
        str(params.dataset),
    )
    if params.signal != "multivariate":
        base = os.path.join(base, str(params.signal))
    return base
