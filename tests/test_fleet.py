"""Fleet trainer tests: vmapped multi-signal training vs the sequential
trainer (bitwise for equal-length families), ragged-mode invariants
(pad rows never read, dummy signals bit-unchanged), and signal-axis
sharding over the 8-device CPU mesh.

The fleet trainer has no reference equivalent (the reference re-runs
train.py per signal); equality against ``train_tadgan`` — itself golden
vs the reference — is the correctness anchor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.parallel.mesh import make_mesh
from hypad_tpu.train import fleet as fl
from hypad_tpu.train import trainer as tr


def _toy_windows(n, w=100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20 * np.pi, n + w)
    s = np.sin(t) + 0.05 * rng.standard_normal(n + w)
    X = np.stack([s[i:i + w] for i in range(n)]).astype(np.float32)
    return np.clip(X, -1, 1)


def _params(hyperbolic, n, seed=0):
    return [init_tadgan(jax.random.PRNGKey(seed), signal_shape=100,
                        hyperbolic=hyperbolic) for _ in range(n)]


def _leaves(state):
    return jax.tree_util.tree_leaves(state.params)


def _assert_bitwise(state_a, state_b):
    for x, y in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("hyperbolic", [False, True])
def test_fleet_equals_sequential_equal_lengths(hyperbolic):
    """An equal-length fleet runs the literal sequential trace per signal:
    final params are BITWISE identical to S independent train_tadgan runs
    with the same seed (same fold_in/chunk key schedule)."""
    Xs = [_toy_windows(96, seed=0), _toy_windows(96, seed=1)]
    fstate = fl.init_fleet_state(_params(hyperbolic, 2), lr=5e-4,
                                 hyperbolic=hyperbolic)
    fstate = fl.train_fleet(fstate, Xs, lr=5e-4, hyperbolic=hyperbolic,
                            batch_size=32, n_epochs=2, seed=0)
    for i, (p, X) in enumerate(zip(_params(hyperbolic, 2), Xs)):
        st = tr.init_train_state(p, lr=5e-4, hyperbolic=hyperbolic)
        st = tr.train_tadgan(st, X, lr=5e-4, hyperbolic=hyperbolic,
                             batch_size=32, n_epochs=2, seed=0)
        _assert_bitwise(st, fl.unstack_state(fstate, i))


@pytest.mark.parametrize("n_epochs", [2, 12])
def test_multi_seed_fleet_equals_sequential(n_epochs):
    """A seed-band fleet (same signal, per-signal seeds) is BITWISE
    identical to sequential train_tadgan runs at those seeds — the key
    stream is fold_in(PRNGKey(seed_i), epoch) per signal, split within
    chunks (12 epochs crosses the 10-epoch chunk boundary, exercising the
    per-signal-keys multi-epoch program)."""
    X = _toy_windows(96, seed=3)
    band = [0, 7]
    fstate = fl.init_fleet_state(
        [init_tadgan(jax.random.PRNGKey(s), signal_shape=100,
                     hyperbolic=False) for s in band],
        lr=5e-4, hyperbolic=False)
    fstate = fl.train_fleet(fstate, [X, X], lr=5e-4, hyperbolic=False,
                            batch_size=32, n_epochs=n_epochs, seeds=band)
    for i, s in enumerate(band):
        st = tr.init_train_state(
            init_tadgan(jax.random.PRNGKey(s), signal_shape=100,
                        hyperbolic=False), lr=5e-4, hyperbolic=False)
        st = tr.train_tadgan(st, X, lr=5e-4, hyperbolic=False,
                             batch_size=32, n_epochs=n_epochs, seed=s)
        _assert_bitwise(st, fl.unstack_state(fstate, i))


def test_multi_seed_fleet_on_mesh_stays_sequential_stream():
    """A seed band on a mesh is padded with REPLICAS, not ragged-forcing
    dummies — S=2 seeds on the 8-device mesh must stay on the sequential
    (non-ragged) RNG stream (the silent-raggedization regression). Sharded
    placement may perturb last-bit float reassociation, so the comparison
    is close-not-bitwise; a ragged-stream divergence is orders of
    magnitude larger."""
    mesh = make_mesh("all")
    X = _toy_windows(96, seed=4)
    band = [0, 5]
    fstate = fl.init_fleet_state(
        [init_tadgan(jax.random.PRNGKey(s), signal_shape=100,
                     hyperbolic=False) for s in band],
        lr=5e-4, hyperbolic=False)
    fstate = fl.train_fleet(fstate, [X, X], lr=5e-4, hyperbolic=False,
                            batch_size=32, n_epochs=2, seeds=band,
                            mesh=mesh)
    for i, s in enumerate(band):
        st = tr.init_train_state(
            init_tadgan(jax.random.PRNGKey(s), signal_shape=100,
                        hyperbolic=False), lr=5e-4, hyperbolic=False)
        st = tr.train_tadgan(st, X, lr=5e-4, hyperbolic=False,
                             batch_size=32, n_epochs=2, seed=s)
        _assert_close(st, fl.unstack_state(fstate, i))


def test_ragged_fleet_matches_unvmapped_body():
    """A mixed-length fleet == the un-vmapped ragged epoch body run per
    signal with the same key schedule (vmap adds nothing numerically)."""
    Xs = [_toy_windows(96, seed=0), _toy_windows(64, seed=1)]
    fstate = fl.init_fleet_state(_params(False, 2), lr=5e-4,
                                 hyperbolic=False)
    fstate = fl.train_fleet(fstate, Xs, lr=5e-4, hyperbolic=False,
                            batch_size=32, n_epochs=3, seed=0)

    body = jax.jit(tr._make_epoch_body(5e-4, False, 32,
                                       constrain=lambda b: b, ragged=True))
    Xpad, n_real = fl.pad_and_stack(Xs)
    base = jax.random.PRNGKey(0)
    # train_fleet's 3-epoch chunking: [2 (epochs 0-1), 1 (epoch 2)] — the
    # same boundaries train_tadgan cuts (break at n_epochs-1)
    for i, p in enumerate(_params(False, 2)):
        st = tr.init_train_state(p, lr=5e-4, hyperbolic=False)
        for k in jax.random.split(jax.random.fold_in(base, 0), 2):
            st, _ = body(st, jnp.asarray(Xpad[i]), k, jnp.int32(n_real[i]))
        st, _ = body(st, jnp.asarray(Xpad[i]), jax.random.fold_in(base, 2),
                     jnp.int32(n_real[i]))
        _assert_bitwise(st, fl.unstack_state(fstate, i))


def test_ragged_pad_rows_never_read():
    """NaN-padding must train bit-identically to zero-padding: a valid step
    gathering even one pad row would poison the params with NaN."""
    Xs = [_toy_windows(96, seed=0), _toy_windows(64, seed=1)]
    keys = jnp.broadcast_to(jax.random.PRNGKey(7), (2, 2))
    fn = fl.build_fleet_epoch_fn(5e-4, False, 32, ragged=True)
    outs = []
    for pad in (0.0, np.nan):
        Xp, nr = fl.pad_and_stack(Xs, pad_value=pad)
        st = fl.init_fleet_state(_params(False, 2), lr=5e-4,
                                 hyperbolic=False)
        st, metrics = fn(st, jnp.asarray(Xp), keys, jnp.asarray(nr))
        outs.append((st, metrics))
    _assert_bitwise(outs[0][0], outs[1][0])
    for v in outs[1][1].values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_ragged_dummy_signal_bit_unchanged():
    """n_real = 0 (mesh-padding dummy): every step masked, state returned
    bit-identical — the mechanism train_fleet uses to pad a fleet to a
    device-count multiple."""
    Xs = [_toy_windows(96, seed=0), _toy_windows(96, seed=1)]
    Xp, _ = fl.pad_and_stack(Xs)
    st = fl.init_fleet_state(_params(False, 2), lr=5e-4, hyperbolic=False)
    before = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(
                  jax.tree_util.tree_map(lambda x: x[1], st.params))]
    fn = fl.build_fleet_epoch_fn(5e-4, False, 32, ragged=True)
    keys = jnp.broadcast_to(jax.random.PRNGKey(0), (2, 2))
    st, metrics = fn(st, jnp.asarray(Xp), keys,
                     jnp.asarray([96, 0], np.int32))
    after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x[1], st.params))
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, np.asarray(b))
    # dummy's masked losses average to exact zero over the max(denom, 1)
    for v in metrics.values():
        assert float(np.asarray(v)[1]) == 0.0


def _assert_close(state_a, state_b):
    # sharding repartitions the batched matmuls, so float reassociation
    # perturbs the last bits (~4e-9) which the adversarial steps then
    # amplify (worst element measured 1.8e-6 after one epoch); anything
    # beyond this tolerance indicates a real divergence
    for x, y in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-5)


def test_fleet_sharded_signal_axis_equals_unsharded():
    """8 signals sharded over the dp mesh (one per device, zero
    collectives) == the same fleet on one device, up to partitioned-matmul
    float reassociation."""
    mesh = make_mesh("all")
    assert mesh is not None and mesh.devices.size == 8
    Xs = [_toy_windows(64, seed=s) for s in range(8)]
    results = []
    for m in (None, mesh):
        st = fl.init_fleet_state(_params(False, 8), lr=5e-4,
                                 hyperbolic=False)
        st = fl.train_fleet(st, Xs, lr=5e-4, hyperbolic=False,
                            batch_size=32, n_epochs=1, seed=0, mesh=m)
        results.append(st)
    _assert_close(results[0], results[1])


def test_fleet_mesh_pads_to_device_multiple():
    """S=3 on an 8-device mesh: train_fleet pads with 5 dummies; the 3 real
    signals match an unsharded fleet forced onto the same ragged stream."""
    mesh = make_mesh("all")
    Xs = [_toy_windows(64, seed=s) for s in range(3)]
    st_m = fl.init_fleet_state(_params(False, 3), lr=5e-4, hyperbolic=False)
    st_m = fl.train_fleet(st_m, Xs, lr=5e-4, hyperbolic=False,
                          batch_size=32, n_epochs=1, seed=0, mesh=mesh)
    st_1 = fl.init_fleet_state(_params(False, 3), lr=5e-4, hyperbolic=False)
    st_1 = fl.train_fleet(st_1, Xs, lr=5e-4, hyperbolic=False,
                          batch_size=32, n_epochs=1, seed=0, ragged=True)
    for i in range(3):
        _assert_close(fl.unstack_state(st_1, i),
                      fl.unstack_state(st_m, i))


def test_fleet_logs_and_checkpoints():
    """log_cb fires per epoch with (S,)-shaped finite metrics; the
    checkpoint cadence matches train_tadgan's (every 10 + n_epochs-1)."""
    Xs = [_toy_windows(64, seed=0), _toy_windows(64, seed=1)]
    logs, ckpts = [], []
    st = fl.init_fleet_state(_params(False, 2), lr=5e-4, hyperbolic=False)
    fl.train_fleet(st, Xs, lr=5e-4, hyperbolic=False, batch_size=32,
                   n_epochs=3, seed=0,
                   log_cb=lambda e, m: logs.append((e, m)),
                   checkpoint_cb=lambda e, s: ckpts.append(e))
    assert [e for e, _ in logs] == [1, 2, 3]
    for _, m in logs:
        for v in m.values():
            assert np.asarray(v).shape == (2,)
            assert np.all(np.isfinite(np.asarray(v)))
    assert ckpts == [2]  # n_epochs-1 cadence point, matching train_tadgan


def test_single_epoch_sliced_bitwise(monkeypatch):
    """Large fleets run the final 1-epoch chunk in SINGLE_EPOCH_MAX_S
    signal slices (the standalone ragged program kernel-faults the v5e
    worker past S=64); slicing the vmap over independent signals must be
    bit-identical to the unsliced program, incl. the replica padding of
    the trailing slice."""
    lens = (70, 64, 55)
    Xs = [_toy_windows(n, seed=s) for s, n in enumerate(lens)]
    st0 = fl.init_fleet_state(_params(False, 3), lr=5e-4, hyperbolic=False)
    full = fl.train_fleet(st0, Xs, lr=5e-4, hyperbolic=False, batch_size=32,
                          n_epochs=11, seed=0)
    monkeypatch.setattr(fl, "SINGLE_EPOCH_MAX_S", 2)  # 3 -> slices 2 + 1pad
    st1 = fl.init_fleet_state(_params(False, 3), lr=5e-4, hyperbolic=False)
    logs = []
    sliced = fl.train_fleet(st1, Xs, lr=5e-4, hyperbolic=False,
                            batch_size=32, n_epochs=11, seed=0,
                            log_cb=lambda e, m: logs.append((e, m)))
    for i in range(3):
        _assert_bitwise(fl.unstack_state(full, i),
                        fl.unstack_state(sliced, i))
    assert [e for e, _ in logs] == list(range(1, 12))
    assert all(np.asarray(v).shape == (3,) for _, m in logs
               for v in m.values())
