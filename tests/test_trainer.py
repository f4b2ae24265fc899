"""Trainer tests: GP semantics, smoke training (euclidean + hyperbolic),
and data-parallel consistency on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train import trainer as tr


def _toy_windows(n=128, w=100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n + w)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + w)
    X = np.stack([s[i:i + w] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def test_whole_batch_gp_matches_hand_formula():
    """For a linear critic C(t) = t @ w the gradient is w broadcast over the
    batch, so gp = (sqrt(B * ||w||^2 + 1e-12) - 1)^2 — the whole-batch norm
    quirk of the reference (train.py:85-93), NOT a per-sample norm."""
    B, W = 8, 10
    w = jnp.arange(1.0, W + 1.0) / W
    interp = jnp.ones((B, W))
    gp = tr._whole_batch_gp(lambda t: t @ w, interp)
    want = (jnp.sqrt(B * jnp.sum(w * w) + 1e-12) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), float(want), rtol=1e-6)


def _run(hyperbolic, mesh=None, n_epochs=2, seed=0):
    X = _toy_windows()
    params = init_tadgan(jax.random.PRNGKey(seed), signal_shape=100,
                         hyperbolic=hyperbolic)
    state = tr.init_train_state(params, lr=5e-4, hyperbolic=hyperbolic)
    logs = []
    state = tr.train_tadgan(
        state, X, lr=5e-4, hyperbolic=hyperbolic, batch_size=32,
        n_epochs=n_epochs, seed=seed, mesh=mesh,
        log_cb=lambda e, m: logs.append(m),
    )
    return state, logs


def test_euclidean_training_smoke():
    state, logs = _run(hyperbolic=False)
    assert len(logs) == 2
    for m in logs:
        for v in m.values():
            assert np.isfinite(v)
    assert int(state.epoch) == 2
    # mse reconstruction metric should not explode
    assert logs[-1]["rec_loss"] < 10.0


def test_hyperbolic_training_smoke():
    state, logs = _run(hyperbolic=True)
    for m in logs:
        for v in m.values():
            assert np.isfinite(v)
    b = state.params["decoder"]["hyperbolic_linear"]["b"]
    assert float(jnp.linalg.norm(b)) < 1.0  # manifold param stays on ball


def test_params_actually_update():
    X = _toy_windows(n=64)
    params = init_tadgan(jax.random.PRNGKey(0), hyperbolic=False)
    state0 = tr.init_train_state(params, lr=5e-4, hyperbolic=False)
    # snapshot before the epoch: the epoch fn donates its input buffers
    before = jax.device_get(state0.params)
    epoch_fn = tr.build_epoch_fn(5e-4, False, 32)
    state1, _ = epoch_fn(state0, jnp.asarray(X), jax.random.PRNGKey(1))
    for mod in ("encoder", "decoder", "critic_x", "critic_z"):
        l0 = jax.tree_util.tree_leaves(before[mod])
        l1 = jax.tree_util.tree_leaves(state1.params[mod])
        changed = any(not np.allclose(a, b) for a, b in zip(l0, l1))
        assert changed, f"{mod} params did not update"


def test_data_parallel_matches_single_device():
    """Same seed: dp-sharded epoch over the 8-device CPU mesh must agree with
    the unsharded run (SURVEY.md §4 multi-device strategy)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 virtual cpu devices"
    mesh = Mesh(devices, ("dp",))

    state_a, logs_a = _run(hyperbolic=True, mesh=None, n_epochs=1)
    state_b, logs_b = _run(hyperbolic=True, mesh=mesh, n_epochs=1)

    for k in logs_a[0]:
        np.testing.assert_allclose(logs_a[0][k], logs_b[0][k],
                                   rtol=1e-4, atol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    # sharded reductions reorder float accumulation; Adam's small denominators
    # amplify the last-ulp differences, so compare with a modest tolerance
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_dp_axis_of_2d_mesh_matches_single_device():
    """The trainer names its PartitionSpec axes explicitly, so it must run
    unchanged on an n-D mesh that carries a 'dp' axis (extra axes
    replicated) — the composability contract for future TP/PP layouts
    (parallel/mesh.make_mesh shape=)."""
    from hypad_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(4, 2), axis_names=("dp", "mp"))
    assert mesh.devices.shape == (4, 2)

    state_a, logs_a = _run(hyperbolic=True, mesh=None, n_epochs=1)
    state_b, logs_b = _run(hyperbolic=True, mesh=mesh, n_epochs=1)
    for k in logs_a[0]:
        np.testing.assert_allclose(logs_a[0][k], logs_b[0][k],
                                   rtol=1e-4, atol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
