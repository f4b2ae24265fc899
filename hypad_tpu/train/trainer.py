"""WGAN-GP trainer (layer L3) — one fused XLA program per epoch.

Behavior spec: reference ``train.py``:
  * critic_x step        :18-104  (Wasserstein loss, elementwise-alpha
                                   interpolation, gradient penalty with the
                                   whole-batch-flattened norm quirk, x10)
  * critic_z step        :107-186
  * generator step       :189-249 (adversarial terms + 10x reconstruction:
                                   MSE euclidean / summed acosh Poincare
                                   distance hyperbolic)
  * epoch schedule       :299-356 (5 FULL passes over the train set for both
                                   critics, then one full generator pass —
                                   note: 5 passes, not 5 steps; each pass is
                                   a fresh shuffle with drop_last)
  * optimizers           :274-288 (Adam for critics; joint enc+dec Adam,
                                   replaced by RiemannianAdam(wd=1e-5,
                                   stabilize=10) when hyperbolic)

TPU-native design: the reference dispatches ~6 x n_batches individual
CUDA-stream steps per epoch from Python; here a whole epoch — shuffling,
all 5 critic passes, the generator pass, optimizer updates — is ONE jitted
XLA program driven by ``lax.scan`` over the batch axis, with the window
tensor resident on device across epochs. Data parallelism is expressed with
``jax.sharding``: batches carry a sharding constraint on the batch axis over
the ``dp`` mesh axis and parameters are replicated, so XLA partitions the
step and inserts the gradient all-reduces over ICI (SURVEY.md §2.3/§5).

Faithfulness notes (quirks preserved intentionally):
  * GP computes ONE l2 norm over the entire flattened (B, W) gradient — the
    reference views gradients as (batch_size_=1, -1) before norm
    (train.py:61,:85-93) — NOT a per-sample norm.
  * alpha is elementwise U(0,1) of the full batch shape (train.py:64-66).
  * when hyperbolic, critics consume Poincare-ball coordinates as "fake"
    while "real" stays (-1,1)-scaled signal (train.py:27-34).
  * all modules stay in train mode throughout (dropout active in critics
    and decoder during every sub-step; freezing is gradient-only).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.models.tadgan import (
    CX_DROPOUT,
    CZ_DROPOUT,
    DEC_LSTM_DROPOUT,
    critic_x_apply,
    critic_z_apply,
    decoder_apply,
    encoder_apply,
    mobius_linear,
)
from hypad_tpu.manifold import stereographic as st
from hypad_tpu.optim.radam import adam, riemannian_adam

N_CRITICS = 5          # full passes per epoch (train.py:301)
GP_WEIGHT = 10.0       # train.py:100,:182
REC_WEIGHT = 10.0      # train.py:234,:244
GP_NORM_EPS = 1e-12    # train.py:90


class TrainState(NamedTuple):
    params: Any          # {"encoder","decoder","critic_x","critic_z"}
    opt_cx: Any
    opt_cz: Any
    opt_gen: Any
    epoch: jnp.ndarray   # scalar int32


def _gen_params(params):
    return {"encoder": params["encoder"], "decoder": params["decoder"]}


def make_optimizers(lr, hyperbolic):
    opt_cx = adam(lr)
    opt_cz = adam(lr)
    if hyperbolic:
        opt_gen = riemannian_adam(lr, weight_decay=1e-5, stabilize=10)
    else:
        opt_gen = adam(lr)
    return opt_cx, opt_cz, opt_gen


def init_train_state(params, lr, hyperbolic):
    opt_cx, opt_cz, opt_gen = make_optimizers(lr, hyperbolic)
    return TrainState(
        params=params,
        opt_cx=opt_cx.init(params["critic_x"]),
        opt_cz=opt_cz.init(params["critic_z"]),
        opt_gen=opt_gen.init(_gen_params(params)),
        epoch=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# per-batch losses
# ---------------------------------------------------------------------------

def _whole_batch_gp(critic_fn, interp):
    """Gradient penalty with the reference's whole-batch-flattened norm
    (train.py:75-93): grad of sum(C(interp)) wrt interp, single l2 norm."""
    grads = jax.grad(lambda t: jnp.sum(critic_fn(t)))(interp)
    gn = jnp.sqrt(jnp.sum(grads * grads) + GP_NORM_EPS)
    return (gn - 1.0) ** 2


# TPU note on the loss structure: the reference applies each critic three
# times per step (real, fake, GP-interpolates; train.py:21,:34,:75). The
# modules are ~100k params, so on TPU these steps are kernel-LATENCY-bound,
# not FLOPs-bound — the three applications are stacked into ONE (3B, ...)
# forward here, and the GP gradient shares that forward via has_aux instead
# of re-running it. Dropout masks are iid Bernoulli per element either way
# (one key over (3B,) rows == three keys over (B,) rows in distribution), so
# the training process is distributionally identical to the reference's;
# measured ~25% off the critic-phase wall-clock (see BENCH notes).

def critic_x_loss(cx_params, gen_params, x, key, hyperbolic, training=True,
                  z=None, alpha=None, drop_masks=None, dec_drop_masks=None):
    """Reference critic_x_iteration (train.py:18-104). x: (B, W).

    ``z``/``alpha`` may be pregenerated (the fused epoch hoists them out of
    the scan as one batched draw per pass — each per-step threefry is
    several kernels and the step is dispatch-bound); None draws them here,
    key-for-key identical to round 2."""
    B = x.shape[0]
    if z is None:
        k_drop, k_z, k_alpha, k_ddrop = jax.random.split(key, 4)
        z = jax.random.normal(
            k_z, (B, gen_params["decoder"]["dense1"]["w"].shape[1]))
        alpha = jax.random.uniform(k_alpha, x.shape)
    else:
        k_drop, k_ddrop = jax.random.split(key, 2)
        k_ddrop = None if dec_drop_masks is not None else k_ddrop
    dec_out = decoder_apply(gen_params["decoder"], z, hyperbolic=hyperbolic,
                            training=training, rng=k_ddrop,
                            lstm_drop_masks=dec_drop_masks)
    x_fake = dec_out[0] if hyperbolic else dec_out

    interp = (alpha * jax.lax.stop_gradient(x)
              + (1.0 - alpha) * jax.lax.stop_gradient(x_fake))

    def gp_sum(t):
        big = jnp.concatenate([x, x_fake, t])
        out = critic_x_apply(cx_params, big, training=training, rng=k_drop,
                             drop_masks=drop_masks)
        return jnp.sum(out[2 * B:]), out

    grads, out = jax.grad(gp_sum, has_aux=True)(interp)
    wl = jnp.mean(out[B: 2 * B]) - jnp.mean(out[:B])  # fake - valid
    gn = jnp.sqrt(jnp.sum(grads * grads) + GP_NORM_EPS)
    return wl + GP_WEIGHT * (gn - 1.0) ** 2


def critic_z_loss(cz_params, gen_params, x, key, hyperbolic, training=True,
                  z=None, alpha=None, drop_masks=None):
    """Reference critic_z_iteration (train.py:107-186). ``z``/``alpha``
    pregenerated like critic_x_loss's."""
    B = x.shape[0]
    latent = gen_params["decoder"]["dense1"]["w"].shape[1]
    if z is None:
        k_drop, k_z, k_alpha = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (B, latent))
        alpha = jax.random.uniform(k_alpha, (B, latent))
    else:
        (k_drop,) = jax.random.split(key, 1)
    z_enc = encoder_apply(gen_params["encoder"], x)

    interp = (alpha * jax.lax.stop_gradient(z)
              + (1.0 - alpha) * jax.lax.stop_gradient(z_enc))

    def gp_sum(t):
        big = jnp.concatenate([z_enc, z, t])
        out = critic_z_apply(cz_params, big, training=training, rng=k_drop,
                             drop_masks=drop_masks)
        return jnp.sum(out[2 * B:]), out

    grads, out = jax.grad(gp_sum, has_aux=True)(interp)
    wl = jnp.mean(out[:B]) - jnp.mean(out[B: 2 * B])  # fake(E(x)) - valid(z)
    gn = jnp.sqrt(jnp.sum(grads * grads) + GP_NORM_EPS)
    return wl + GP_WEIGHT * (gn - 1.0) ** 2


def generator_loss(gen_params, cx_params, cz_params, x, key, hyperbolic,
                   training=True, z=None, masks=None):
    """Reference decoder_iteration (train.py:189-249). Returns
    (loss, (rec_metric,)) where rec_metric is hyper_loss or mse.
    ``z`` pregenerated like critic_x_loss's; ``masks``: optional dict of
    pregenerated dropout keep-masks {m_cx, m_cz, m_dec}."""
    B = x.shape[0]
    latent = gen_params["decoder"]["dense1"]["w"].shape[1]
    if z is None:
        (k_z, k_cz, k_cx, k_ddrop) = jax.random.split(key, 4)
        z = jax.random.normal(k_z, (B, latent))
    else:
        (k_cz, k_cx, k_ddrop) = jax.random.split(key, 3)
    masks = masks or {}

    z_enc = encoder_apply(gen_params["encoder"], x)
    fake_gen_z = critic_z_apply(cz_params, z_enc, training=training, rng=k_cz,
                                drop_masks=masks.get("m_cz"))

    # the reference runs the decoder twice (on z ~ N and on E(x),
    # train.py:214,:223); one stacked (2B, latent) forward halves the
    # latency-bound op count (iid dropout either way)
    dec_out = decoder_apply(gen_params["decoder"],
                            jnp.concatenate([z, z_enc]),
                            hyperbolic=hyperbolic, training=training,
                            rng=k_ddrop, lstm_drop_masks=masks.get("m_dec"))
    if hyperbolic:
        hyper, _ = dec_out
        x_gen_, x_gen_rec = hyper[:B], hyper[B:]
    else:
        x_gen_, x_gen_rec = dec_out[:B], dec_out[B:]
    fake_gen_x = critic_x_apply(cx_params, x_gen_, training=training, rng=k_cx,
                                drop_masks=masks.get("m_cx"))

    adv = -jnp.mean(fake_gen_x) - jnp.mean(fake_gen_z)

    if hyperbolic:
        hyper_x = mobius_linear(gen_params["decoder"]["hyperbolic_linear"], x)
        dist = st.acosh_poincare_distance(x_gen_rec, hyper_x)
        rec = jnp.sum(dist) / B          # train.py:232
    else:
        rec = jnp.mean((x - x_gen_rec) ** 2)  # nn.MSELoss, train.py:243
    return REC_WEIGHT * rec + adv, rec


# ---------------------------------------------------------------------------
# fused epoch
# ---------------------------------------------------------------------------

def _shuffled_batches(key, X, n_batches, batch_size):
    """Device-side shuffle + drop_last reshape -> (n_batches, B, ...)."""
    perm = jax.random.permutation(key, X.shape[0])[: n_batches * batch_size]
    return X[perm].reshape((n_batches, batch_size) + X.shape[1:])


def _shuffled_index(key, n, n_batches, batch_size):
    """Shuffle INDICES only -> (n_batches, B) int32; the scan body gathers
    its own batch from the resident X. Avoids materializing epoch-sized
    shuffled copies of the data up front (measured ~1.8ms/epoch on v5e for
    the 5-pass stack at Yahoo-A1 size — ~10% of the epoch)."""
    perm = jax.random.permutation(key, n)[: n_batches * batch_size]
    return perm.reshape(n_batches, batch_size)


def _masked_shuffled_index(key, n, n_real, n_batches, batch_size):
    """Ragged-mode shuffle: a uniform random permutation of the first
    ``n_real`` (traced) of ``n`` padded rows, truncated drop_last-style.

    argsort of iid U(0,1) keys is a uniform permutation; pushing pad rows'
    keys above the real range keeps them out of the first ``n_real``
    positions, so every VALID batch (see the step-validity mask) sees only
    real rows. Distributionally identical to the sequential trainer's
    ``jax.random.permutation`` shuffle (train.py:315-331 semantics), but not
    the same RNG stream — ragged fleets are documented as distributionally
    rather than bitwise equivalent (train/fleet.py)."""
    u = jax.random.uniform(key, (n,))
    u = jnp.where(jnp.arange(n) < n_real, u, 2.0)
    order = jnp.argsort(u)
    return order[: n_batches * batch_size].reshape(n_batches, batch_size)


def _mesh_constrain(mesh):
    """Batch-axis dp sharding constraint (identity without a mesh)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def constrain(b):  # (B, ...) -> shard the batch axis
            spec = P("dp", *([None] * (b.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                b, NamedSharding(mesh, spec))
    else:
        def constrain(b):
            return b
    return constrain


def build_epoch_fn(lr, hyperbolic, batch_size, mesh=None,
                   fused_critics=False):
    """Compile-once epoch runner: (state, X, key) -> (state, metrics).

    ``mesh``: optional jax.sharding.Mesh with a 'dp' axis; batches get a
    sharding constraint over it so XLA partitions every step across devices.
    ``fused_critics``: opt-in single-device path that runs each critic step's
    entire value_and_grad as ONE hand-derived Pallas kernel
    (train/critic_kernel.py); numerically equivalent, not bitwise (MXU
    contraction order differs from XLA's fusion choices). ``"full"`` also
    fuses the critic step's gradient-free generator forwards into the same
    kernel (measured 1.39x the hyperbolic epoch on v5e, PROFILE.md).
    """
    if fused_critics and mesh is not None and mesh.devices.size > 1:
        raise ValueError(
            "fused_critics is a single-device path (the megakernel is not "
            "shard_map'd over the dp mesh); use the default critic step "
            "when training over multiple devices")
    return jax.jit(
        _make_epoch_body(lr, hyperbolic, batch_size, _mesh_constrain(mesh),
                         fused_critics=fused_critics),
        donate_argnums=(0,))


def _make_epoch_body(lr, hyperbolic, batch_size, constrain, ragged=False,
                     fused_critics=False):
    """The un-jitted fused-epoch computation — shared by the sequential
    trainer (build_epoch_fn jits it directly) and the fleet trainer
    (train/fleet.py vmaps it over a stacked signal family).

    Returns ``epoch(state, X, key)``, or ``epoch(state, X, key, n_real)``
    when ``ragged``: X is then zero-padded to a common length and ``n_real``
    (a traced int32 scalar) marks the real row count. Ragged mode masks the
    shuffles to real rows and no-ops the scan steps past each signal's own
    ``5 * (n_real // batch_size)`` critic / ``n_real // batch_size``
    generator step counts, so every signal trains exactly its sequential
    drop_last schedule (reference train.py:299-356).
    """
    opt_cx, opt_cz, opt_gen = make_optimizers(lr, hyperbolic)

    def joint_critic_loss(critics, gen, x, kx, kz, draws):
        # one vjp for both critics: the two losses share no parameters
        # (critic_x_loss is independent of critic_z and vice versa, and the
        # generator is frozen here), so d(lx+lz)/d{cx,cz} yields exactly the
        # two sequential gradients of the reference's back-to-back
        # critic_x_iteration / critic_z_iteration (train.py:320,:325) in a
        # single fused backward pass
        lx = critic_x_loss(critics["cx"], gen, x, kx, hyperbolic,
                           z=draws["z_x"], alpha=draws["a_x"],
                           drop_masks=draws["m_cx"],
                           dec_drop_masks=draws["m_dec"])
        lz = critic_z_loss(critics["cz"], gen, x, kz, hyperbolic,
                           z=draws["z_z"], alpha=draws["a_z"],
                           drop_masks=draws["m_cz"])
        return lx + lz, (lx, lz)

    def _masked(valid, new, old):
        # ragged no-op step: keep the pre-step carry (params, moments AND
        # step counters) so a masked step is indistinguishable from never
        # having run — each signal's optimizer trajectory exactly matches
        # its own sequential drop_last schedule
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), new, old)

    def make_critic_batch_fused(X):
        """Pallas megakernel critic step (opt-in; see train/critic_kernel.py).

        The two critics' forward + GP double-backward + parameter grads
        collapse into one kernel. With ``fused_critics="full"`` the
        generator forwards producing ``x_fake``/``z_enc`` (gradient-free in
        a critic step) fuse into the SAME kernel; with ``True`` they stay in
        XLA. Same pregenerated draws, same loss/metric semantics."""
        from hypad_tpu.train.critic_kernel import (
            critic_step_fused_full,
            critics_fused_grads,
        )

        def critic_batch(carry, inp):
            params, o_cx, o_cz = carry
            if ragged:
                idx, key, draws, valid = inp
            else:
                idx, key, draws = inp
            del key  # dropout comes entirely from the pregenerated masks
            x = constrain(X[idx])

            if fused_critics == "full":
                lx, lz, gx, gz = critic_step_fused_full(
                    params, x, draws, hyperbolic)
            else:
                gen = _gen_params(params)
                dec_out = decoder_apply(gen["decoder"], draws["z_x"],
                                        hyperbolic=hyperbolic, training=True,
                                        lstm_drop_masks=draws["m_dec"])
                x_fake = dec_out[0] if hyperbolic else dec_out
                interp_x = draws["a_x"] * x + (1.0 - draws["a_x"]) * x_fake
                z_enc = encoder_apply(gen["encoder"], x)
                interp_z = (draws["a_z"] * draws["z_z"]
                            + (1.0 - draws["a_z"]) * z_enc)
                bigx = jnp.concatenate([x, x_fake, interp_x])
                bigz = jnp.concatenate([z_enc, draws["z_z"], interp_z])
                lx, lz, gx, gz = critics_fused_grads(
                    params["critic_x"], params["critic_z"], bigx, bigz,
                    draws["m_cx"], draws["m_cz"])

            new_cx, new_o_cx = opt_cx.update(gx, o_cx, params["critic_x"])
            new_cz, new_o_cz = opt_cz.update(gz, o_cz, params["critic_z"])
            new_params = dict(params, critic_x=new_cx, critic_z=new_cz)

            if ragged:
                new_params, new_o_cx, new_o_cz = _masked(
                    valid, (new_params, new_o_cx, new_o_cz),
                    (params, o_cx, o_cz))
                lx = jnp.where(valid, lx, 0.0)
                lz = jnp.where(valid, lz, 0.0)
            return (new_params, new_o_cx, new_o_cz), (lx, lz)

        return critic_batch

    def make_critic_batch(X):
        if fused_critics:
            return make_critic_batch_fused(X)

        def critic_batch(carry, inp):
            params, o_cx, o_cz = carry
            if ragged:
                idx, key, draws, valid = inp
            else:
                idx, key, draws = inp
            x = constrain(X[idx])
            kx, kz = jax.random.split(key)
            gen = _gen_params(params)

            (_, (lx, lz)), grads = jax.value_and_grad(
                joint_critic_loss, has_aux=True)(
                {"cx": params["critic_x"], "cz": params["critic_z"]},
                gen, x, kx, kz, draws)
            new_cx, new_o_cx = opt_cx.update(grads["cx"], o_cx,
                                             params["critic_x"])
            new_cz, new_o_cz = opt_cz.update(grads["cz"], o_cz,
                                             params["critic_z"])
            new_params = dict(params, critic_x=new_cx, critic_z=new_cz)

            if ragged:
                new_params, new_o_cx, new_o_cz = _masked(
                    valid, (new_params, new_o_cx, new_o_cz),
                    (params, o_cx, o_cz))
                lx = jnp.where(valid, lx, 0.0)
                lz = jnp.where(valid, lz, 0.0)
            return (new_params, new_o_cx, new_o_cz), (lx, lz)

        return critic_batch

    def make_gen_batch(X):
        def gen_batch(carry, inp):
            params, o_gen = carry
            if ragged:
                idx, key, z, masks, valid = inp
            else:
                idx, key, z, masks = inp
            x = constrain(X[idx])
            gen = _gen_params(params)
            (loss, rec), grads = jax.value_and_grad(
                generator_loss, has_aux=True)(
                gen, params["critic_x"], params["critic_z"], x, key,
                hyperbolic, z=z, masks=masks)
            new_gen, new_o_gen = opt_gen.update(grads, o_gen, gen)
            new_params = dict(params, encoder=new_gen["encoder"],
                              decoder=new_gen["decoder"])
            if ragged:
                new_params, new_o_gen = _masked(
                    valid, (new_params, new_o_gen), (params, o_gen))
                loss = jnp.where(valid, loss, 0.0)
                rec = jnp.where(valid, rec, 0.0)
            return (new_params, new_o_gen), (loss, rec)

        return gen_batch

    def epoch_fn(state: TrainState, X, key, n_real=None):
        n = X.shape[0]
        n_batches = n // batch_size
        keys = jax.random.split(key, 2 * N_CRITICS + 2)

        # ---- 5 full critic passes, fresh shuffle each (train.py:315-331);
        # only int32 indices are staged — each step gathers its batch from
        # the resident X inside the scan
        if ragged:
            n_batches_real = n_real // batch_size
            critic_idx = jnp.concatenate([
                _masked_shuffled_index(keys[i], n, n_real, n_batches,
                                       batch_size)
                for i in range(N_CRITICS)
            ])
            pass_valid = jnp.arange(n_batches) < n_batches_real
            critic_valid = jnp.tile(pass_valid, N_CRITICS)
        else:
            critic_idx = jnp.concatenate([
                _shuffled_index(keys[i], n, n_batches, batch_size)
                for i in range(N_CRITICS)
            ])  # (5 * n_batches, B)
        S = critic_idx.shape[0]
        latent = state.params["decoder"]["dense1"]["w"].shape[1]
        cx_hidden = state.params["critic_x"]["dense1"]["w"].shape[0]
        cz_hidden = state.params["critic_z"]["dense1"]["w"].shape[0]
        lstm0 = state.params["decoder"]["lstm"][0]
        dec_width = lstm0["w_hh"].shape[1] * (2 if "w_ih_rev" in lstm0 else 1)
        kk = jax.random.split(keys[N_CRITICS], 8)
        # hoist the per-step z / GP-alpha / critic-dropout draws out of the
        # scan: one batched threefry per tensor kind per epoch instead of
        # ~10 per step (the step is dispatch-bound at ~0.4us/kernel — see
        # tools/profile_epoch.py; measured 8.6 -> 7.6 ms for the critic
        # phase of a Yahoo-A1 epoch)
        draws = {
            "z_x": jax.random.normal(kk[0], (S, batch_size, latent)),
            "a_x": jax.random.uniform(kk[1], (S, batch_size, X.shape[1])),
            "z_z": jax.random.normal(kk[2], (S, batch_size, latent)),
            "a_z": jax.random.uniform(kk[3], (S, batch_size, latent)),
            # critics run on stacked (3B,) rows: real, fake, GP-interpolates
            "m_cx": jax.random.bernoulli(
                kk[4], 1.0 - CX_DROPOUT, (S, 4, 3 * batch_size, cx_hidden)),
            "m_cz": jax.random.bernoulli(
                kk[5], 1.0 - CZ_DROPOUT, (S, 2, 3 * batch_size, cz_hidden)),
            # decoder inter-layer LSTM dropout ((1 mask) x (T=1, B, 2H))
            "m_dec": jax.random.bernoulli(
                kk[6], 1.0 - DEC_LSTM_DROPOUT, (S, 1, 1, batch_size, dec_width)),
        }
        step_keys = jax.random.split(kk[7], S)
        critic_xs = (critic_idx, step_keys, draws)
        if ragged:
            critic_xs += (critic_valid,)
        (params_c, o_cx, o_cz), (lx, lz) = jax.lax.scan(
            make_critic_batch(X),
            (state.params, state.opt_cx, state.opt_cz),
            critic_xs,
        )

        # ---- one generator pass (train.py:347-356)
        if ragged:
            gen_idx = _masked_shuffled_index(keys[N_CRITICS + 1], n, n_real,
                                             n_batches, batch_size)
        else:
            gen_idx = _shuffled_index(keys[N_CRITICS + 1], n, n_batches,
                                      batch_size)
        gk = jax.random.split(keys[-1], 6)
        gkeys = jax.random.split(gk[0], n_batches)
        gen_z = jax.random.normal(gk[1], (n_batches, batch_size, latent))
        gen_masks = {
            "m_cx": jax.random.bernoulli(
                gk[2], 1.0 - CX_DROPOUT, (n_batches, 4, batch_size, cx_hidden)),
            "m_cz": jax.random.bernoulli(
                gk[3], 1.0 - CZ_DROPOUT, (n_batches, 2, batch_size, cz_hidden)),
            # gen runs the decoder on stacked (2B,) rows: z and E(x)
            "m_dec": jax.random.bernoulli(
                gk[4], 1.0 - DEC_LSTM_DROPOUT, (n_batches, 1, 1, 2 * batch_size, dec_width)),
        }
        gen_xs = (gen_idx, gkeys, gen_z, gen_masks)
        if ragged:
            gen_xs += (pass_valid,)
        (params_g, o_gen), (lg, rec) = jax.lax.scan(
            make_gen_batch(X), (params_c, state.opt_gen), gen_xs)

        if ragged:
            # masked steps contributed exact zeros; average over REAL steps
            denom_c = jnp.maximum(N_CRITICS * n_batches_real, 1)
            denom_g = jnp.maximum(n_batches_real, 1)
            metrics = {
                "critic_x_loss": jnp.sum(lx) / denom_c,
                "critic_z_loss": jnp.sum(lz) / denom_c,
                "decoder_loss": jnp.sum(lg) / denom_g,
                "rec_loss": jnp.sum(rec) / denom_g,
            }
        else:
            metrics = {
                "critic_x_loss": jnp.mean(lx),
                "critic_z_loss": jnp.mean(lz),
                "decoder_loss": jnp.mean(lg),
                "rec_loss": jnp.mean(rec),
            }
        new_state = TrainState(params=params_g, opt_cx=o_cx, opt_cz=o_cz,
                               opt_gen=o_gen, epoch=state.epoch + 1)
        return new_state, metrics

    return epoch_fn


def build_multi_epoch_fn(lr, hyperbolic, batch_size, epochs_per_call,
                         mesh=None, fused_critics=False):
    """Fuse ``epochs_per_call`` epochs into ONE device program via lax.scan.

    On remote/tunneled accelerators the per-call host round-trip dominates a
    ~20ms epoch; batching epochs amortizes it. Ten epochs per call lines up
    with the reference's checkpoint cadence (train.py:381), so no extra host
    syncs are introduced. Returns (state, stacked per-epoch metrics).
    """
    single = build_epoch_fn(lr, hyperbolic, batch_size, mesh=mesh,
                            fused_critics=fused_critics)

    def multi(state, X, key):
        def body(st, k):
            st2, m = single(st, X, k)
            return st2, m

        keys = jax.random.split(key, epochs_per_call)
        return jax.lax.scan(body, state, keys)

    return jax.jit(multi, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# training driver (host loop over epochs; everything inside is on-device)
# ---------------------------------------------------------------------------

def train_tadgan(state: TrainState, X: np.ndarray, *, lr, hyperbolic,
                 batch_size, n_epochs, seed=0, mesh=None,
                 checkpoint_cb=None, log_cb=None, start_epoch=0,
                 epochs_per_call=10, fused_critics=False):
    """Run the full training schedule. ``X``: (N, W) float32 windows.

    ``checkpoint_cb(epoch, state)`` fires every 10 epochs and at the end
    (reference train.py:381-385 cadence). ``log_cb(epoch, metrics)`` per
    epoch. Epochs are batched ``epochs_per_call`` per device program
    (chunk boundaries are cut at every multiple of 10 and at n_epochs-1 so
    the checkpoint cadence needs no extra host syncs). Returns the final
    state.
    """
    X = jnp.asarray(X, jnp.float32)
    base_key = jax.random.PRNGKey(seed)

    # chunk the remaining epochs, breaking at checkpoint epochs
    # (reference cadence: every 10 and at n_epochs-1, train.py:381)
    actual_epoch = start_epoch
    boundaries = []
    e = start_epoch
    while e < n_epochs:
        nxt = min(((e // 10) + 1) * 10, n_epochs)
        if e < n_epochs - 1 < nxt:
            nxt = n_epochs - 1
        nxt = min(nxt, e + max(epochs_per_call, 1))
        boundaries.append(nxt - e)
        e = nxt

    fns = {}  # chunk size -> compiled multi-epoch fn

    def get_fn(n):
        if n not in fns:
            if n == 1:
                fns[n] = build_epoch_fn(lr, hyperbolic, batch_size, mesh=mesh,
                                        fused_critics=fused_critics)
            else:
                fns[n] = build_multi_epoch_fn(lr, hyperbolic, batch_size, n,
                                              mesh=mesh,
                                              fused_critics=fused_critics)
        return fns[n]

    for chunk in boundaries:
        key = jax.random.fold_in(base_key, actual_epoch)
        if chunk == 1:
            state, metrics = get_fn(1)(state, X, key)
            stacked = jax.tree_util.tree_map(lambda v: v[None], metrics)
        else:
            state, stacked = get_fn(chunk)(state, X, key)
        if log_cb is not None:
            host = jax.device_get(stacked)
            for j in range(chunk):
                log_cb(actual_epoch + j + 1,
                       {k: v[j] for k, v in host.items()})
        actual_epoch += chunk
        if checkpoint_cb is not None and (
            actual_epoch % 10 == 0 or actual_epoch == n_epochs - 1
        ):
            checkpoint_cb(actual_epoch, state)
    return state
