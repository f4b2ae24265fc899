"""Fleet trainer: train a whole family of signals in ONE XLA program.

The reference trains a benchmark family (e.g. the 9 NAB signals of
``data/anomalies.csv``, or a Yahoo A1-A4 sweep) by re-running ``train.py``
once per signal (reference ``main.py:14-70`` driven per-config), paying the
full process + compile + per-step dispatch cost S times. On TPU the fused
epoch is kernel-LATENCY-bound, not FLOPs-bound (~114 kernels / ~25 us per
critic step on v5e at ~100k params — see PROFILE.md), so S independent
models fit in the same dispatch budget as one: ``jax.vmap`` over a stacked
signal axis turns every (B, W) matmul into an (S, B, W) batched matmul at
near-identical kernel latency.

Design:
  * The vmapped computation is the literal sequential trace
    (``trainer._make_epoch_body``) — equal-length families run the same
    per-signal program as ``train_tadgan`` with the same per-epoch keys, so
    each signal's parameter trajectory matches the sequential trainer's
    (asserted in tests/test_fleet.py).
  * Ragged families (signals of different lengths) are zero-padded to a
    common length and trained in ``ragged`` mode: shuffles are masked to
    each signal's real rows and steps past a signal's own
    ``5 * (n_real // B)`` critic / ``n_real // B`` generator drop_last
    schedule are no-ops (pre-step carry kept), so every signal still trains
    exactly its sequential schedule — with a different (but distributionally
    identical) shuffle stream; see ``trainer._masked_shuffled_index``.
  * Multi-chip: the SIGNAL axis is sharded over the mesh's ``dp`` axis —
    embarrassingly parallel (zero collectives ride the ICI; each device
    trains its shard of the fleet). Fleets are padded with ``n_real = 0``
    dummy signals to a device-count multiple; a dummy's every step is
    masked, so its state is returned bit-unchanged.

Replaces: per-signal re-invocation of reference ``train.py:299-356`` over a
family sweep (no reference equivalent exists — the reference has no
multi-signal batching at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hypad_tpu.train.trainer import (
    TrainState,
    _make_epoch_body,
    init_train_state,
)


# ---------------------------------------------------------------------------
# stacking helpers
# ---------------------------------------------------------------------------

def stack_states(states):
    """Stack S per-signal TrainStates into one leading-axis-S TrainState."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked, i):
    """Slice signal ``i``'s TrainState out of a stacked fleet state."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def init_fleet_state(params_list, lr, hyperbolic):
    """Per-signal ``init_train_state`` then stack (host-side; transfer the
    finished stacked pytree in one device_put like the CLI does)."""
    return stack_states([init_train_state(p, lr, hyperbolic)
                         for p in params_list])


def pad_and_stack(X_list, pad_value=0.0, target_len=None):
    """Zero-pad (N_i, W) window arrays to max N (or ``target_len``, the
    canonical-shape path) and stack -> ((S, N, W), n_real (S,) int32). Pad
    contents are never read by a valid step (the masked shuffle keeps pad
    rows out of real batch positions)."""
    n_max = max(x.shape[0] for x in X_list)
    if target_len is not None:
        assert target_len >= n_max
        n_max = target_len
    w = X_list[0].shape[1]
    out = np.full((len(X_list), n_max, w), pad_value, np.float32)
    n_real = np.zeros((len(X_list),), np.int32)
    for i, x in enumerate(X_list):
        out[i, : x.shape[0]] = x
        n_real[i] = x.shape[0]
    return out, n_real


# ---------------------------------------------------------------------------
# fleet epoch programs
# ---------------------------------------------------------------------------

def _fleet_constrain(mesh):
    """Shard the leading SIGNAL axis of every leaf over the dp mesh axis."""
    from hypad_tpu.parallel.mesh import shard_leading

    return shard_leading(mesh)


def build_fleet_epoch_fn(lr, hyperbolic, batch_size, ragged=False,
                         mesh=None, fused_critics=False):
    """Compile-once fleet epoch: (states, Xs, keys[, n_real]) -> (states,
    metrics), everything carrying a leading signal axis S.

    ``keys``: (S, 2) uint32 — identical rows reproduce the sequential
    trainer's same-seed-per-signal semantics. ``metrics`` values are (S,).

    ``fused_critics``: the trainer's critic-step Pallas megakernel opt-in
    — vmap lowers the grid=() kernel to a grid-S loop, so the whole
    family's critic steps stay one dispatch per scan step (measured
    compiled + loss-matching under vmap on v5e; single-device only, like
    the sequential opt-in).
    """
    if fused_critics and mesh is not None and mesh.devices.size > 1:
        raise ValueError(
            "fused_critics is a single-device path (the megakernel is not "
            "shard_map'd); use the default critic step on a multi-device "
            "mesh")
    body = _make_epoch_body(lr, hyperbolic, batch_size,
                            constrain=lambda b: b, ragged=ragged,
                            fused_critics=fused_critics)
    vmapped = jax.vmap(body)
    constrain = _fleet_constrain(mesh)

    if ragged:
        def fleet_fn(states, Xs, keys, n_real):
            states, Xs = constrain(states), constrain(Xs)
            return vmapped(states, Xs, keys, n_real)
    else:
        def fleet_fn(states, Xs, keys):
            states, Xs = constrain(states), constrain(Xs)
            return vmapped(states, Xs, keys)

    return jax.jit(fleet_fn, donate_argnums=(0,))


def build_fleet_multi_epoch_fn(lr, hyperbolic, batch_size, epochs_per_call,
                               ragged=False, mesh=None,
                               per_signal_keys=False, fused_critics=False):
    """Fuse ``epochs_per_call`` fleet epochs into one device program
    (same host-round-trip amortization as ``build_multi_epoch_fn``).

    ``per_signal_keys``: the key argument is (S, 2) — one chunk key PER
    SIGNAL (multi-seed fleets, ``train_fleet(seeds=...)``) — and each
    signal's per-epoch keys are its own ``jax.random.split``, exactly the
    stream a sequential ``train_tadgan(seed=seed_i)`` run would draw."""
    single = build_fleet_epoch_fn(lr, hyperbolic, batch_size, ragged=ragged,
                                  mesh=mesh, fused_critics=fused_critics)

    def _epoch_keys(key, n_signals):
        """(E, S, 2) per-epoch per-signal keys from a (2,) or (S, 2) key."""
        if per_signal_keys:
            return jnp.swapaxes(
                jax.vmap(lambda k: jax.random.split(k, epochs_per_call))(
                    key), 0, 1)
        keys = jax.random.split(key, epochs_per_call)
        return jnp.broadcast_to(keys[:, None],
                                (epochs_per_call, n_signals) + key.shape)

    if ragged:
        def multi(states, Xs, key, n_real):
            def step(st, ks):
                return single(st, Xs, ks, n_real)

            return jax.lax.scan(step, states,
                                _epoch_keys(key, Xs.shape[0]))
    else:
        def multi(states, Xs, key):
            def step(st, ks):
                return single(st, Xs, ks)

            return jax.lax.scan(step, states,
                                _epoch_keys(key, Xs.shape[0]))

    return jax.jit(multi, donate_argnums=(0,))


# The STANDALONE single-epoch fleet program (build_fleet_epoch_fn, and any
# scan-of-1 — XLA simplifies it to the same HLO) kernel-faults the v5e TPU
# worker for fleets past this size: measured cliff S=64 ok -> S=65 crash on
# the ragged hyperbolic A1-sized program (2026-08-18, "TPU worker process
# crashed ... kernel fault"). The SAME body inside a >=2-length epoch scan
# (build_fleet_multi_epoch_fn) compiles differently and is proven to S=100,
# as is the non-ragged standalone program at S=67 — but the final 1-epoch
# checkpoint-cadence chunk of a big fleet must dodge the bad codegen:
# signals are independent under vmap, so train_fleet runs that chunk in
# <=64-signal slices (replica-padded to ONE compiled shape, extras
# discarded) with bit-identical per-signal semantics.
SINGLE_EPOCH_MAX_S = 64


def _single_epoch_sliced(fn, args):
    """Run the single-epoch fleet program in SINGLE_EPOCH_MAX_S-sized
    signal slices (see SINGLE_EPOCH_MAX_S). The trailing slice is padded
    with replicas of the last signals so every call shares one compiled
    shape; replica outputs are dropped. ``args`` leaves all carry the
    leading S axis."""
    S = args[1].shape[0]
    n_pad = (-S) % SINGLE_EPOCH_MAX_S
    if n_pad:
        args = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, x[-n_pad:]]), args)
    st_parts, m_parts = [], []
    for lo in range(0, S + n_pad, SINGLE_EPOCH_MAX_S):
        sub = jax.tree_util.tree_map(
            lambda x: x[lo:lo + SINGLE_EPOCH_MAX_S], args)
        st_p, m_p = fn(*sub)
        st_parts.append(st_p)
        m_parts.append(m_p)
    cat = lambda *xs: jnp.concatenate(xs)[:S]  # noqa: E731
    return (jax.tree_util.tree_map(cat, *st_parts),
            jax.tree_util.tree_map(cat, *m_parts))


# ---------------------------------------------------------------------------
# training driver
# ---------------------------------------------------------------------------

def train_fleet(states, X_list, *, lr, hyperbolic, batch_size, n_epochs,
                seed=0, mesh=None, checkpoint_cb=None, log_cb=None,
                start_epoch=0, epochs_per_call=10, ragged=None,
                return_staged=False, seeds=None, canonical=False,
                fused_critics=False):
    """Train S signals' models jointly in fused fleet programs.

    ``states``: stacked TrainState (leading axis S, see ``stack_states``).
    ``X_list``: list of S (N_i, W) float32 window arrays. Equal-length
    families run the exact sequential trace per signal; ragged ones the
    masked schedule. The per-chunk key schedule (``fold_in(key, epoch)``,
    chunks broken at the 10-epoch checkpoint cadence) mirrors
    ``train_tadgan`` so equal-length fleets are key-for-key identical to S
    sequential runs. ``checkpoint_cb(epoch, stacked_state)`` /
    ``log_cb(epoch, metrics)`` with (S,) metric arrays.

    Returns the final stacked state (dummy pad signals, if the mesh forced
    padding, are the caller's to ignore via ``unstack_state``).

    ``ragged``: None picks the mode automatically (ragged iff lengths
    differ or the mesh forces dummy padding); True forces the ragged
    stream on an equal-length fleet — the shuffle RNG stream differs
    between modes, so like-for-like comparisons must pin it.

    ``seeds``: optional per-signal seed list (len S) — each signal draws
    the key stream a sequential ``train_tadgan(seed=seed_i)`` run would
    (``fold_in(PRNGKey(seed_i), epoch)`` chunk keys, split within chunks),
    so a SEED BAND of one signal trains as a fleet in one program
    (`hypad sweep --seeds`); overrides ``seed``. Equal-length multi-seed
    fleets draw the SAME key stream as the sequential runs and are
    bitwise-identical to them on CPU (tests/test_fleet.py); on TPU the
    vmapped (S, B, W) matmuls tile differently than sequential (B, W)
    ones, so last-bit float differences make on-chip band entries
    distribution-equivalent draws rather than bit-reproductions
    (PARITY.md A3/A4 note). On a mesh, seed bands are padded to a device
    multiple with REPLICAS (not ragged-forcing dummies) to preserve the
    sequential stream. Mixed-length multi-seed fleets run the ragged
    stream, which does NOT reproduce sequential runs bit-for-bit.

    ``return_staged``: also return the DEVICE-RESIDENT padded window stack
    as ``(states, (Xs, n_real))`` so unique-dataset sweeps (test == train)
    can run fleet detection on the already-uploaded array instead of
    paying the host pad + tunnel upload again (measured 2.5 s of a 3.6 s
    call at S=81 x 1320 x 100; detect/scorer.detect_scores_fleet
    ``staged=``). ``Xs`` may carry mesh-pad dummy rows past the first
    ``len(X_list)`` signals; ``n_real`` covers the real signals only.

    ``fused_critics``: False | True | "full" — the trainer's critic-step
    Pallas megakernel opt-in, vmapped over the family (single-device only:
    raises at entry on a >1-device mesh; "full" also fuses the generator
    forwards). Numerically equivalent per signal, not bitwise.

    ``canonical``: pad the window axis to the detection-side rung ladder
    (detect/scorer.FLEET_N_RUNGS) and the signal axis up the
    FLEET_S_RUNGS ladder (mesh-divisible) with masked dummy signals, so
    different families compile to the SAME program shapes — in-process jit reuse
    aside, the remote backend's fingerprint cache then serves family B's
    training programs from family A's compiles even across processes
    (measured 9.5 s vs 91 s cold, CLAUDE.md). Forces the ragged stream:
    per-signal trajectories are distributionally identical but NOT bitwise
    equal to unpadded runs (the masked shuffle draws over the padded row
    count), so the seed-band bitwise claim does not compose with it. The
    ``return_staged`` stack comes back already canonical, making
    detection's own canonical pad a no-op.
    """
    if fused_critics and mesh is not None and mesh.devices.size > 1:
        # fail BEFORE run-dir side effects and the state/window upload —
        # the builder-level guard would only fire at the first chunk
        raise ValueError(
            "fused_critics is a single-device path (the megakernel is not "
            "shard_map'd); use the default critic step on a multi-device "
            "mesh")
    lens = {x.shape[0] for x in X_list}
    S = len(X_list)
    n_pad = 0
    ndev = int(mesh.devices.size) if mesh is not None else 1
    if mesh is not None:
        n_pad = (-S) % ndev
    target_len = None
    if canonical:
        from hypad_tpu.detect.scorer import canonical_fleet_shape

        if ragged is False:
            raise ValueError("canonical shapes require the ragged stream")
        ragged = True
        # the SAME helper detection's staged-accept uses (mesh-divisible
        # rung, capped at the HBM chunk) — computed here once so the staged
        # stack lands exactly on the shape detect_scores_fleet will reuse
        # as-is; a fleet past the chunk cap stays unpadded on the signal
        # axis (detection chunks it anyway, dummy signals would only waste
        # training compute)
        S_c, target_len = canonical_fleet_shape(
            S, max(x.shape[0] for x in X_list), X_list[0].shape[1], ndev)
        target_S = max(S_c, S)
        target_S += (-target_S) % ndev
        n_pad = target_S - S
    if seeds is not None and len(lens) == 1 and n_pad and ragged is not True:
        # equal-length seed band on a mesh: replicate the last signal
        # instead of dummy-padding — dummies force ragged mode, whose
        # shuffle stream breaks the band's promised bitwise equality to
        # sequential runs; replicas keep the non-ragged stream and are
        # simply ignored by the caller (unstack_state over the real S)
        X_list = list(X_list) + [X_list[-1]] * n_pad
        seeds = list(seeds) + [seeds[-1]] * n_pad
        states = stack_states(
            [unstack_state(states, i) for i in range(S)]
            + [unstack_state(states, S - 1)] * n_pad)
        S, n_pad = len(X_list), 0
    need_ragged = len(lens) > 1 or n_pad > 0
    if ragged is None:
        ragged = need_ragged
    elif need_ragged and not ragged:
        raise ValueError("mixed-length or mesh-padded fleets require "
                         "ragged mode")

    if ragged:
        Xs, n_real = pad_and_stack(list(X_list) + [
            np.zeros((1, X_list[0].shape[1]), np.float32)] * n_pad,
            target_len=target_len)
        n_real[S:] = 0  # mesh-pad dummies never take a step
        if n_pad:
            states = stack_states(
                [unstack_state(states, i) for i in range(S)]
                + [unstack_state(states, S - 1)] * n_pad)
        n_real = jnp.asarray(n_real)
    else:
        Xs = jnp.asarray(np.stack(X_list), jnp.float32)
        n_real = None
    Xs = jnp.asarray(Xs, jnp.float32)

    if seeds is not None:
        assert len(seeds) == S, "one seed per signal"
        # mesh-pad dummies reuse the last seed (their steps are masked)
        base_keys = jnp.stack([jax.random.PRNGKey(int(s))
                               for s in list(seeds) + [seeds[-1]] * n_pad])
    base_key = jax.random.PRNGKey(seed)

    # chunk boundaries: identical to train_tadgan's (checkpoint cadence)
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

    fns = {}

    def get_fn(n):
        if n not in fns:
            if n == 1:
                fns[n] = build_fleet_epoch_fn(
                    lr, hyperbolic, batch_size, ragged=ragged, mesh=mesh,
                    fused_critics=fused_critics)
            else:
                fns[n] = build_fleet_multi_epoch_fn(
                    lr, hyperbolic, batch_size, n, ragged=ragged, mesh=mesh,
                    per_signal_keys=seeds is not None,
                    fused_critics=fused_critics)
        return fns[n]

    S_total = Xs.shape[0]
    for chunk in boundaries:
        if seeds is not None:
            key = jax.vmap(
                lambda k: jax.random.fold_in(k, actual_epoch))(base_keys)
        else:
            key = jax.random.fold_in(base_key, actual_epoch)
        if chunk == 1:
            keys = (key if seeds is not None else
                    jnp.broadcast_to(key, (S_total,) + key.shape))
            args = (states, Xs, keys) + ((n_real,) if ragged else ())
            if S_total > SINGLE_EPOCH_MAX_S:
                states, metrics = _single_epoch_sliced(get_fn(1), args)
            else:
                states, metrics = get_fn(1)(*args)
            stacked = jax.tree_util.tree_map(lambda v: v[None], metrics)
        else:
            args = (states, Xs, key) + ((n_real,) if ragged else ())
            states, stacked = get_fn(chunk)(*args)
        if log_cb is not None:
            host = jax.device_get(stacked)
            for j in range(chunk):
                log_cb(actual_epoch + j + 1,
                       {k: v[j] for k, v in host.items()})
        actual_epoch += chunk
        if checkpoint_cb is not None and (
            actual_epoch % 10 == 0 or actual_epoch == n_epochs - 1
        ):
            checkpoint_cb(actual_epoch, states)
    if return_staged:
        lens = np.asarray([x.shape[0] for x in X_list], np.int32)
        return states, (Xs, lens)
    return states
