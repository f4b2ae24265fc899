"""Checkpoint/resume: orbax round-trip must restore typed states that can
continue training (regression: orbax returns namedtuples as dicts)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import trainer as tr
from hypad_tpu.utils import checkpoint as ck


def test_roundtrip_and_continue_training(tmp_path):
    X = np.random.default_rng(0).uniform(-1, 1, (80, 100)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(0), hyperbolic=True)
    state = tr.init_train_state(params, lr=5e-4, hyperbolic=True)
    epoch_fn = tr.build_epoch_fn(5e-4, True, 32)
    state, _ = epoch_fn(state, jnp.asarray(X), jax.random.PRNGKey(1))

    ck.save_state(str(tmp_path), state, 1)
    restored = ck.restore_state(str(tmp_path), 1)

    assert int(restored.epoch) == int(state.epoch) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored as typed RAdamState and usable
    assert int(restored.opt_cx.step) > 0

    # the restored state must continue training without error
    state2, metrics = epoch_fn(restored, jnp.asarray(X),
                               jax.random.PRNGKey(2))
    assert int(state2.epoch) == 2
    assert np.isfinite(float(metrics["decoder_loss"]))


def test_latest_epoch_tag(tmp_path):
    assert ck.latest_epoch_tag(str(tmp_path)) is None
    params = init_tadgan(jax.random.PRNGKey(0), hyperbolic=False)
    state = tr.init_train_state(params, lr=5e-4, hyperbolic=False)
    ck.save_state(str(tmp_path), state, 10)
    ck.save_state(str(tmp_path), state, 20)
    ck.save_state(str(tmp_path), state, "final")
    assert ck.latest_epoch_tag(str(tmp_path)) == 20


def test_snapshot_config(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("epochs: 3\n")
    run = tmp_path / "run"
    ck.snapshot_config(str(run), str(cfg))
    assert (run / "config.yaml").read_text() == "epochs: 3\n"
