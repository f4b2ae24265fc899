"""Equivalence tests for the fused critic-step Pallas megakernel.

The kernel (train/critic_kernel.py) hand-derives the entire
``jax.value_and_grad(joint_critic_loss)`` — forward, Wasserstein means, GP
input gradient, and the first+second-order parameter gradients — so every
claim is checked against the autodiff path it replaces (reference semantics:
train.py:18-186), with the same pregenerated draws the fused epoch uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.models.tadgan import init_tadgan
from hypad_tpu.train.critic_kernel import critics_fused_grads
from hypad_tpu.train import trainer as tr

B, W, LATENT, CXH, CZH = 16, 100, 20, 20, 20


def _draws(key, hyperbolic):
    kk = jax.random.split(key, 8)
    dec_width = 128  # decoder: 2-layer bidirectional, hidden 64
    return {
        "z_x": jax.random.normal(kk[0], (B, LATENT)),
        "a_x": jax.random.uniform(kk[1], (B, W)),
        "z_z": jax.random.normal(kk[2], (B, LATENT)),
        "a_z": jax.random.uniform(kk[3], (B, LATENT)),
        "m_cx": jax.random.bernoulli(kk[4], 0.75, (4, 3 * B, CXH)),
        "m_cz": jax.random.bernoulli(kk[5], 0.8, (2, 3 * B, CZH)),
        "m_dec": jax.random.bernoulli(kk[6], 0.8, (1, 1, B, dec_width)),
    }


def _autodiff_reference(params, x, draws, hyperbolic):
    gen = tr._gen_params(params)
    key = jax.random.PRNGKey(7)  # consumed only by unused split branches

    def joint(critics):
        lx = tr.critic_x_loss(critics["cx"], gen, x, key, hyperbolic,
                              z=draws["z_x"], alpha=draws["a_x"],
                              drop_masks=draws["m_cx"],
                              dec_drop_masks=draws["m_dec"])
        lz = tr.critic_z_loss(critics["cz"], gen, x, key, hyperbolic,
                              z=draws["z_z"], alpha=draws["a_z"],
                              drop_masks=draws["m_cz"])
        return lx + lz, (lx, lz)

    (_, (lx, lz)), grads = jax.value_and_grad(joint, has_aux=True)(
        {"cx": params["critic_x"], "cz": params["critic_z"]})
    return lx, lz, grads["cx"], grads["cz"]


def _fused(params, x, draws, hyperbolic):
    from hypad_tpu.models.tadgan import decoder_apply, encoder_apply

    gen = tr._gen_params(params)
    dec_out = decoder_apply(gen["decoder"], draws["z_x"],
                            hyperbolic=hyperbolic, training=True,
                            lstm_drop_masks=draws["m_dec"])
    x_fake = dec_out[0] if hyperbolic else dec_out
    interp_x = draws["a_x"] * x + (1.0 - draws["a_x"]) * x_fake
    z_enc = encoder_apply(gen["encoder"], x)
    interp_z = draws["a_z"] * draws["z_z"] + (1.0 - draws["a_z"]) * z_enc
    bigx = jnp.concatenate([x, x_fake, interp_x])
    bigz = jnp.concatenate([z_enc, draws["z_z"], interp_z])
    return critics_fused_grads(params["critic_x"], params["critic_z"],
                               bigx, bigz, draws["m_cx"], draws["m_cz"])


@pytest.mark.parametrize("hyperbolic", [False, True])
def test_fused_matches_autodiff(hyperbolic):
    key = jax.random.PRNGKey(0 if hyperbolic else 1)
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_tadgan(k1, signal_shape=W, hyperbolic=hyperbolic)
    x = jax.random.uniform(k2, (B, W), minval=-1.0, maxval=1.0)
    draws = _draws(k3, hyperbolic)

    lx_r, lz_r, gx_r, gz_r = _autodiff_reference(params, x, draws, hyperbolic)
    lx_f, lz_f, gx_f, gz_f = _fused(params, x, draws, hyperbolic)

    np.testing.assert_allclose(lx_f, lx_r, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(lz_f, lz_r, rtol=2e-5, atol=1e-6)
    for name, (a, b) in {
        "gx": (gx_f, gx_r), "gz": (gz_f, gz_r),
    }.items():
        flat_a = jax.tree_util.tree_leaves_with_path(a)
        flat_b = jax.tree_util.tree_leaves(b)
        for (path, la), lb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=5e-5, atol=5e-7,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("hyperbolic", [False, True])
def test_full_megakernel_matches_autodiff(hyperbolic):
    """The FULL variant (generator forwards fused in-kernel too) matches
    the same autodiff reference end to end — LSTM T=1 cells, decoder
    dropout, Mobius head, interps, and both critics' grads."""
    from hypad_tpu.train.critic_kernel import critic_step_fused_full

    key = jax.random.PRNGKey(11 if hyperbolic else 12)
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_tadgan(k1, signal_shape=W, hyperbolic=hyperbolic)
    x = jax.random.uniform(k2, (B, W), minval=-1.0, maxval=1.0)
    draws = _draws(k3, hyperbolic)

    lx_r, lz_r, gx_r, gz_r = _autodiff_reference(params, x, draws, hyperbolic)
    lx_f, lz_f, gx_f, gz_f = critic_step_fused_full(params, x, draws,
                                                    hyperbolic)

    np.testing.assert_allclose(lx_f, lx_r, rtol=5e-5, atol=2e-6)
    np.testing.assert_allclose(lz_f, lz_r, rtol=5e-5, atol=2e-6)
    for name, (a, b) in {
        "gx": (gx_f, gx_r), "gz": (gz_f, gz_r),
    }.items():
        for (path, la), lb in zip(jax.tree_util.tree_leaves_with_path(a),
                                  jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-6,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("ragged,variant", [
    (False, "full"), (True, "full"), (False, True),
])
def test_fleet_fused_tracks_default(ragged, variant):
    """The megakernel under jax.vmap (fleet trainer opt-in) stays on the
    default fleet trajectory — equal-length and ragged streams, both kernel
    variants. n_epochs=3 exercises BOTH builders (a 2-epoch
    build_fleet_multi_epoch_fn scan chunk + a single-epoch chunk)."""
    from hypad_tpu.train import fleet as fl

    S, bs = 3, 16
    lens = (96, 64, 80) if ragged else (96, 96, 96)
    key = jax.random.PRNGKey(5)
    with jax.default_device(jax.devices("cpu")[0]):
        states = fl.stack_states([
            tr.init_train_state(
                init_tadgan(jax.random.PRNGKey(i), signal_shape=W,
                            hyperbolic=True), lr=5e-4, hyperbolic=True)
            for i in range(S)])
        X = [np.asarray(jax.random.uniform(jax.random.fold_in(key, i),
                                           (n, W), minval=-1.0, maxval=1.0),
                        np.float32) for i, n in enumerate(lens)]

    def run(fused):
        st = jax.tree_util.tree_map(jnp.copy, states)
        return fl.train_fleet(st, X, lr=5e-4, hyperbolic=True,
                              batch_size=bs, n_epochs=3, seed=0,
                              ragged=ragged or None,
                              fused_critics=fused)

    want = run(False)
    got = run(variant)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(got.params),
            jax.tree_util.tree_leaves(want.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fleet_multi_device_mesh_rejected():
    """The fleet guard must fire at train_fleet ENTRY (before run-dir /
    upload side effects), and in the builder."""
    from hypad_tpu.parallel.mesh import make_mesh
    from hypad_tpu.train import fleet as fl

    mesh = make_mesh("all")
    if mesh is None or mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh (conftest forces 8)")
    with pytest.raises(ValueError, match="single-device"):
        fl.build_fleet_epoch_fn(5e-4, True, 16, mesh=mesh,
                                fused_critics="full")
    states = fl.stack_states([
        tr.init_train_state(init_tadgan(jax.random.PRNGKey(0),
                                        signal_shape=W, hyperbolic=True),
                            lr=5e-4, hyperbolic=True)])
    with pytest.raises(ValueError, match="single-device"):
        fl.train_fleet(states, [np.zeros((32, W), np.float32)], lr=5e-4,
                       hyperbolic=True, batch_size=16, n_epochs=1,
                       mesh=mesh, fused_critics="full")


def test_multi_device_mesh_rejected():
    """The megakernel is single-device; a >1-device dp mesh must fail fast
    rather than silently compute unsharded."""
    from hypad_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("all")
    if mesh is None or mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh (conftest forces 8)")
    with pytest.raises(ValueError, match="single-device"):
        tr.build_epoch_fn(0.005, True, 16, mesh=mesh, fused_critics="full")


def test_config_key_validates():
    from hypad_tpu.utils.config import load_config

    with pytest.raises(ValueError, match="fused_critics"):
        load_config({"signal": "nyc_taxi", "fused_critics": "sideways"})
    p = load_config({"signal": "nyc_taxi", "fused_critics": "full"})
    assert p.fused_critics == "full"


@pytest.mark.parametrize("hyperbolic", [False, True])
def test_fused_epoch_tracks_default(hyperbolic):
    """One full fused-critic epoch stays numerically on the default epoch's
    trajectory (same draws by construction — both paths share the epoch
    body's pregenerated RNG; differences are contraction-order rounding
    amplified through ~N steps of Adam)."""
    n, bs = 96, 16
    key = jax.random.PRNGKey(3)
    kp, kx, ke = jax.random.split(key, 3)
    params = init_tadgan(kp, signal_shape=W, hyperbolic=hyperbolic)
    X = jax.random.uniform(kx, (n, W), minval=-1.0, maxval=1.0)
    state0 = tr.init_train_state(params, lr=0.005, hyperbolic=hyperbolic)

    ref_fn = tr.build_epoch_fn(0.005, hyperbolic, bs)
    fused_fn = tr.build_epoch_fn(0.005, hyperbolic, bs, fused_critics=True)

    sr, mr = ref_fn(jax.tree_util.tree_map(jnp.copy, state0), X, ke)
    sf, mf = fused_fn(jax.tree_util.tree_map(jnp.copy, state0), X, ke)

    np.testing.assert_allclose(mf["critic_x_loss"], mr["critic_x_loss"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(mf["critic_z_loss"], mr["critic_z_loss"],
                               rtol=1e-3, atol=1e-4)
    for (path, la), lb in zip(
            jax.tree_util.tree_leaves_with_path(sf.params),
            jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=5e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))
