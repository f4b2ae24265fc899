"""Epoch chunking must preserve the reference checkpoint cadence
(every 10 epochs + n_epochs-1, train.py:381) regardless of epochs_per_call."""

import jax
import numpy as np
import pytest

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import trainer as tr


def _run(n_epochs, start_epoch=0, epochs_per_call=10):
    X = np.random.default_rng(0).uniform(-1, 1, (64, 100)).astype(np.float32)
    params = init_tadgan(jax.random.PRNGKey(0), hyperbolic=False)
    state = tr.init_train_state(params, lr=5e-4, hyperbolic=False)
    saved = []
    state = tr.train_tadgan(
        state, X, lr=5e-4, hyperbolic=False, batch_size=32,
        n_epochs=n_epochs, start_epoch=start_epoch,
        epochs_per_call=epochs_per_call,
        checkpoint_cb=lambda e, s: saved.append(e))
    return saved, state


@pytest.mark.parametrize("n_epochs,want", [
    # numbered saves at epoch%10==0 or epoch==n_epochs-1 (train.py:381);
    # the unsuffixed FINAL save is separate (train.py:461-464, cli.py)
    (40, [10, 20, 30, 39, 40]),
    (25, [10, 20, 24]),
    (3, [2]),
    (1, []),  # neither 1%10==0 nor 1==n_epochs-1(=0)
])
def test_checkpoint_cadence(n_epochs, want):
    saved, state = _run(n_epochs)
    assert saved == want
    assert int(state.epoch) == n_epochs


def test_resume_cadence_continues():
    saved, state = _run(40, start_epoch=20)
    assert saved == [30, 39, 40]
    assert int(state.epoch) == 20  # epoch counter counts epochs run in-state


def test_epochs_per_call_one_matches_cadence():
    saved, _ = _run(25, epochs_per_call=1)
    assert saved == [10, 20, 24]
