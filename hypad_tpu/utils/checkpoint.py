"""Checkpoint / resume (aux subsystem; SURVEY.md §5).

Behavior spec: the reference pickles whole nn.Modules every 10 epochs with an
epoch suffix plus unsuffixed finals (train.py:381-385,:461-464) and copies the
config YAML into the run dir (train.py:442). Its TRAINING resume is broken
(undefined ``resume_path`` NameError, train.py:400-404); detection-side epoch
resume works (anomaly_detection.py:211-222).

TPU-native equivalent: orbax pytree checkpoints of the full TrainState
(params + optimizer moments + epoch), same cadence and directory naming;
training resume is implemented working (the reference's bug is documented,
not reproduced — a NameError is not behavior anyone depends on).
"""

from __future__ import annotations

import os
import shutil

import jax
import orbax.checkpoint as ocp

from hypad_tpu.train.trainer import TrainState


def _ckpt_path(run_dir, tag):
    return os.path.abspath(os.path.join(run_dir, f"state_{tag}"))


def save_state(run_dir, state: TrainState, tag):
    """tag: epoch number or 'final'."""
    path = _ckpt_path(run_dir, tag)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    return path


def restore_state(run_dir, tag) -> TrainState:
    path = _ckpt_path(run_dir, tag)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    # orbax round-trips namedtuples as plain dicts; rebuild the typed states
    # (critic Adam states are packed flat vectors, PackedAdamState; the
    # generator's RAdamState keeps per-leaf moment pytrees)
    from hypad_tpu.optim.radam import PackedAdamState, RAdamState

    def as_opt_state(d):
        if isinstance(d, (RAdamState, PackedAdamState)):
            return d
        if isinstance(d["mu"], dict):
            return RAdamState(**d)
        return PackedAdamState(**d)

    return TrainState(
        params=restored["params"],
        opt_cx=as_opt_state(restored["opt_cx"]),
        opt_cz=as_opt_state(restored["opt_cz"]),
        opt_gen=as_opt_state(restored["opt_gen"]),
        epoch=restored["epoch"],
    )


def latest_epoch_tag(run_dir):
    """Highest epoch-numbered checkpoint in run_dir, or None."""
    if not os.path.isdir(run_dir):
        return None
    tags = []
    for name in os.listdir(run_dir):
        if name.startswith("state_") and name != "state_final":
            try:
                tags.append(int(name[len("state_"):]))
            except ValueError:
                pass
    return max(tags) if tags else None


def snapshot_config(run_dir, config_path):
    """Copy the YAML into the run dir for reproducible detection
    (reference train.py:442)."""
    os.makedirs(run_dir, exist_ok=True)
    if config_path and os.path.isfile(config_path):
        shutil.copy(config_path, os.path.join(run_dir, "config.yaml"))


def snapshot_effective(run_dir, params):
    """Write the EFFECTIVE params as the run-dir config snapshot.

    Sweep runs (cli.cmd_sweep) derive per-run params that differ from the
    config file on disk (the swept ``signal``, a band's ``seed`` and
    seed_{k}/ ``output_root``) — copying the file verbatim would make a
    later ``hypad detect --config <run>/config.yaml`` re-enter the WRONG
    run. The snapshot round-trips through utils/config.load_config."""
    import yaml

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(vars(params), f, default_flow_style=False)
