"""Fused critic-step Pallas megakernel (opt-in).

The shipped critic step is kernel-LATENCY-bound: 114 XLA kernels / ~25 us on
v5e (PROFILE.md), most of them the WGAN-GP double-backward through the two
critic MLP chains (reference ``train.py:18-186``). This module collapses the
entire ``jax.value_and_grad(joint_critic_loss)`` of BOTH critics — forward on
the stacked (3B, .) rows, the Wasserstein means, the gradient-penalty input
gradient, its norm, AND the first+second-order parameter gradients — into ONE
hand-derived Pallas kernel.

Why a closed form exists: the critic chains are piecewise-linear
(``leaky_relu`` + inverted dropout + ``Linear``), so with the dropout masks
fixed (the trainer pregenerates them; train/trainer.py ``draws``) the network
is locally linear and every derivative is an explicit product of the layer
matrices and the slope/keep diagonals:

  forward   : h_i = Drop_i(leaky(h_{i-1} W_i^T + b_i))
  GP input  : g   = d(sum out_gp)/dt = ((W_out o D_L) W_L ...) W_1
  wl params : gW_i = e_i^T h_{i-1},  e_i = (e_{i+1} W_{i+1}) o D_i
  GP params : gW_i += w_i^T u_{i-1},  u_i = D_i o (u_{i-1} W_i^T)
              (the u-chain is the FORWARD chain applied to the cotangent
               u_0 = 20*(gn-1)/gn * g; biases get no GP-path gradient
               because d(leaky')/da == 0 a.e. — exactly what autodiff of
               the ``where`` yields)

where D_i = keep_i/(1-p) * leaky'(a_i) is the per-element backward diagonal.

All operands fit in VMEM with room to spare (the critics are ~3.3k params;
rows = 3B <= a few hundred), so the kernel runs grid=() with every
intermediate on-chip: one dispatch instead of ~60.

Semantics are those of ``trainer.joint_critic_loss`` +
``jax.value_and_grad`` with pregenerated masks (equivalence asserted in
tests/test_critic_kernel.py); the euclidean/hyperbolic generator forward that
produces ``x_fake``/``z_enc`` stays in XLA (its gradients are never needed in
the critic step). Opt-in via ``build_epoch_fn(..., fused_critics=True)``;
default path unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hypad_tpu.models.tadgan import CX_DROPOUT, CZ_DROPOUT

GP_WEIGHT = 10.0     # train.py:100,:182
GP_NORM_EPS = 1e-12  # train.py:90
LEAKY_SLOPE = 0.2


def _mm(a, b):
    """a @ b — contract a[-1] with b[0]."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b.T — contract a[-1] with b[-1] (torch Linear forward)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a.T @ b — contract a[0] with b[0] (weight-grad outer product)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _dleaky(x):
    return jnp.where(x >= 0, 1.0, LEAKY_SLOPE)


def _chain_forward(big, Ws, bs, masks, rate):
    """Hidden-layer chain: returns (h_list, D_list) with h_list[0] = big.

    h_list[i+1] is the post-dropout activation after hidden layer i;
    D_list[i] is the combined backward diagonal keep/(1-p) * leaky'(a_i),
    with the same divide-by-(1-p) arithmetic as models.tadgan._dropout."""
    inv = 1.0 / (1.0 - rate)  # noqa: F841 — rate enters via division below
    hs, Ds = [big], []
    h = big
    for W, b, m in zip(Ws, bs, masks):
        a = _mm_nt(h, W) + b                      # (3B, H)
        l = _leaky(a)
        keep = m > 0
        h = jnp.where(keep, l / (1.0 - rate), 0.0)
        Ds.append(jnp.where(keep, _dleaky(a) / (1.0 - rate), 0.0))
        hs.append(h)
    return hs, Ds


def _critic_grads(big, Ws, bs, Wo, bo, masks, rate, B, sign):
    """Loss + full parameter gradients for one critic on stacked rows.

    ``big``: (3B, in) = [first-B, second-B, GP-interp]; ``sign``: +1 when
    wl = mean(rows B:2B) - mean(rows :B) (critic_x, train.py:153), -1 for
    the flipped critic_z convention (train.py:182)."""
    rows = big.shape[0]
    hs, Ds = _chain_forward(big, Ws, bs, masks, rate)
    # scalar-output layer as multiply+reduce with the bias added SEPARATELY:
    # Mosaic rejects a (3B,H)->(3B,1) dot whose bias fuses in as a
    # non-constant reduction accumulator ("only constant accumulators
    # supported")
    out = jnp.sum(hs[-1] * Wo, axis=1, keepdims=True)
    out = out + bo                                # (3B, 1)

    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    half = jnp.where(ridx < B, -1.0, jnp.where(ridx < 2 * B, 1.0, 0.0))
    c = (sign / B) * half                         # wl cotangent on out
    wl = jnp.sum(out * c)

    # --- GP input gradient g on the interp rows (backward chain) ---------
    nL = len(Ws)
    w_gp = []                                     # w_i = v_i o D_i, GP rows
    v = jnp.broadcast_to(Wo, (B, Wo.shape[1]))    # d(sum out)/dh_L
    for i in range(nL - 1, -1, -1):
        w = v * Ds[i][2 * B:]
        w_gp.append(w)
        v = _mm(w, Ws[i])                         # d(sum out)/dh_{i-1}
    w_gp.reverse()                                # w_gp[i] pairs with Ws[i]
    g = v                                         # (B, in)

    gn = jnp.sqrt(jnp.sum(g * g) + GP_NORM_EPS)
    loss = wl + GP_WEIGHT * (gn - 1.0) ** 2

    # --- wl-path parameter grads (standard backprop, cotangent c) --------
    gWs = [None] * nL
    gbs = [None] * nL
    e = c
    gWo = _mm_tn(e, hs[-1])                       # (1, H)
    gbo = jnp.sum(e, axis=0, keepdims=True)       # (1, 1)
    W_next = Wo
    for i in range(nL - 1, -1, -1):
        e = _mm(e, W_next) * Ds[i]
        gWs[i] = _mm_tn(e, hs[i])
        gbs[i] = jnp.sum(e, axis=0, keepdims=True)
        W_next = Ws[i]

    # --- GP-path parameter grads (second order; u-chain forward on u0) ---
    u = (2.0 * GP_WEIGHT * (gn - 1.0) / gn) * g   # d(GP term)/dg
    for i in range(nL):
        gWs[i] = gWs[i] + _mm_tn(w_gp[i], u)
        u = Ds[i][2 * B:] * _mm_nt(u, Ws[i])
    gWo = gWo + jnp.sum(u, axis=0, keepdims=True)

    return loss, gWs, gbs, gWo, gbo


def _kernel(B, cx_rate, cz_rate,
            # inputs
            bigx_ref, bigz_ref, mx_ref, mz_ref,
            xW1, xb1, xW2, xb2, xW3, xb3, xW4, xb4, xW5, xb5,
            zW1, zb1, zW2, zb2, zW3, zb3,
            # outputs
            lx_ref, lz_ref,
            gxW1, gxb1, gxW2, gxb2, gxW3, gxb3, gxW4, gxb4, gxW5, gxb5,
            gzW1, gzb1, gzW2, gzb2, gzW3, gzb3):
    lx, gWs, gbs, gWo, gbo = _critic_grads(
        bigx_ref[:],
        [xW1[:], xW2[:], xW3[:], xW4[:]],
        [xb1[:], xb2[:], xb3[:], xb4[:]],
        xW5[:], xb5[:],
        [mx_ref[i] for i in range(4)], cx_rate, B, sign=+1.0)
    lx_ref[:] = jnp.full((1, 1), lx)
    for ref, val in zip((gxW1, gxW2, gxW3, gxW4), gWs):
        ref[:] = val
    for ref, val in zip((gxb1, gxb2, gxb3, gxb4), gbs):
        ref[:] = val
    gxW5[:] = gWo
    gxb5[:] = gbo

    lz, gWs, gbs, gWo, gbo = _critic_grads(
        bigz_ref[:],
        [zW1[:], zW2[:]], [zb1[:], zb2[:]],
        zW3[:], zb3[:],
        [mz_ref[i] for i in range(2)], cz_rate, B, sign=-1.0)
    lz_ref[:] = jnp.full((1, 1), lz)
    for ref, val in zip((gzW1, gzW2), gWs):
        ref[:] = val
    for ref, val in zip((gzb1, gzb2), gbs):
        ref[:] = val
    gzW3[:] = gWo
    gzb3[:] = gbo


_CX_LAYERS = ("dense1", "dense2", "dense3", "dense4", "dense5")
_CZ_LAYERS = ("dense1", "dense2", "dense3")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_impl(cx_params, cz_params, bigx, bigz, mx, mz, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = bigx.shape[0] // 3
    f32 = jnp.float32

    def flat(params, layers):
        arrs = []
        for name in layers:
            w = params[name]["w"].astype(f32)
            b = params[name]["b"].astype(f32).reshape(1, -1)
            arrs += [w, b]
        return arrs

    cx_flat = flat(cx_params, _CX_LAYERS)
    cz_flat = flat(cz_params, _CZ_LAYERS)
    inputs = ([bigx.astype(f32), bigz.astype(f32),
               mx.astype(f32), mz.astype(f32)] + cx_flat + cz_flat)

    out_shape = ([jax.ShapeDtypeStruct((1, 1), f32)] * 2
                 + [jax.ShapeDtypeStruct(a.shape, f32)
                    for a in cx_flat + cz_flat])
    outs = pl.pallas_call(
        functools.partial(_kernel, B, CX_DROPOUT, CZ_DROPOUT),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        interpret=interpret,
    )(*inputs)

    lx = outs[0][0, 0]
    lz = outs[1][0, 0]

    def tree(flat_outs, layers, params):
        t = {}
        for i, name in enumerate(layers):
            t[name] = {
                "w": flat_outs[2 * i],
                "b": flat_outs[2 * i + 1].reshape(
                    params[name]["b"].shape),
            }
        return t

    gx = tree(outs[2: 2 + 2 * len(_CX_LAYERS)], _CX_LAYERS, cx_params)
    gz = tree(outs[2 + 2 * len(_CX_LAYERS):], _CZ_LAYERS, cz_params)
    return lx, lz, gx, gz


def critics_fused_grads(cx_params, cz_params, bigx, bigz, mx, mz,
                        interpret=None):
    """(lx, lz, grads_cx, grads_cz) for one critic step, one TPU kernel.

    ``bigx``: (3B, W) stacked [x, x_fake, interp_x]; ``bigz``: (3B, L)
    stacked [z_enc, z, interp_z]; ``mx``/``mz``: pregenerated bool keep-masks
    (4, 3B, Hx) / (2, 3B, Hz) — exactly the trainer's ``draws["m_cx"]`` /
    ``draws["m_cz"]`` step slices. Auto-interprets off-TPU."""
    if interpret is None:
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    return _fused_impl(cx_params, cz_params, bigx, bigz, mx, mz, interpret)


# ===========================================================================
# FULL critic-step megakernel: generator forwards fused in too
# ===========================================================================
#
# The critics-only kernel above still leaves the per-step encoder/decoder
# forwards (T=1 LSTM cells, dense heads, the Mobius head) as ~50 XLA
# kernels. Those forwards are *gradient-free* in a critic step (only the
# critics' parameters are updated; reference train.py:320-331 freezes the
# generator), so they are plain arithmetic and fuse into the same kernel:
# the whole step body below the batch gather and above the Adam update is
# ONE dispatch.
#
# T=1 LSTM cell with zero initial state (the reference always packs the
# window into the feature dim, models/tadgan.py:24): the recurrent matmul
# vanishes, gates = x W_ih^T + b_ih + b_hh. Manifold ops follow the exact
# clamp table of manifold/stereographic.py (math_.py:51-59,:340-352).

_TANH_CLAMP = 15.0
_NORM_FLOOR = 1e-15
_PROJECT_EPS_F32 = 4e-3
_DEC_RATE = 0.2  # decoder inter-layer LSTM dropout (models/tadgan.py:40)


def _row_norm(x):
    return jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), _NORM_FLOOR)


def _lstm_t1(x, wih, bih, bhh):
    """One torch LSTM cell at T=1 with zero initial state -> h (B, H)."""
    gates = _mm_nt(x, wih) + bih + bhh            # (B, 4H)
    H = wih.shape[0] // 4
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = gates[:, 1 * H:2 * H]                     # unused: f*c0 == 0
    del f
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c = i * g
    return o * jnp.tanh(c)


def _bi_lstm_t1(x, p):
    """Bidirectional T=1 layer: [fw, bw] concat on features (B, 2H)."""
    h_fw = _lstm_t1(x, p["w_ih"], p["b_ih"], p["b_hh"])
    h_bw = _lstm_t1(x, p["w_ih_rev"], p["b_ih_rev"], p["b_hh_rev"])
    return jnp.concatenate([h_fw, h_bw], axis=1)


def _mobius_head(x, mw, mb):
    """MobiusLinear forward, k=-1 (hyperspace/hyrnn_nets.py:13-35):
    matvec -> expmap0 -> mobius_add(bias) -> project, with the
    stereographic clamp table."""
    u = _mm_nt(x, mw)                             # (B, W)
    un = _row_norm(u)
    e = jnp.tanh(jnp.clip(un, -_TANH_CLAMP, _TANH_CLAMP)) * (u / un)
    b = jnp.broadcast_to(mb, e.shape)
    x2 = jnp.sum(e * e, axis=1, keepdims=True)
    y2 = jnp.sum(b * b, axis=1, keepdims=True)
    xy = jnp.sum(e * b, axis=1, keepdims=True)
    num = (1.0 + 2.0 * xy + y2) * e + (1.0 - x2) * b      # k = -1
    den = 1.0 + 2.0 * xy + x2 * y2
    s = num / jnp.maximum(den, _NORM_FLOOR)
    sn = _row_norm(s)
    maxnorm = 1.0 - _PROJECT_EPS_F32
    return jnp.where(sn > maxnorm, s / sn * maxnorm, s)


def _gen_forward(x, z_x, a_x, z_z, a_z, m_dec, enc, dec, hyperbolic):
    """The critic step's generator forwards (gradient-free): returns
    (bigx, bigz) stacked rows for the two critics."""
    # encoder (models/tadgan.py:106-124): bi-LSTM(100->50) + dense
    eh = _bi_lstm_t1(x, enc["lstm"])
    z_enc = _mm_nt(eh, enc["dw"]) + enc["db"]     # (B, latent)

    # decoder (models/tadgan.py:131-163): dense -> 2-layer bi-LSTM(64)
    # with inter-layer dropout -> dense -> tanh [-> Mobius head]
    h = _mm_nt(z_x, dec["d1w"]) + dec["d1b"]      # (B, 50)
    h1 = _bi_lstm_t1(h, dec["l1"])                # (B, 128)
    h1 = jnp.where(m_dec > 0, h1 / (1.0 - _DEC_RATE), 0.0)
    h2 = _bi_lstm_t1(h1, dec["l2"])               # (B, 128)
    xdec = jnp.tanh(_mm_nt(h2, dec["d2w"]) + dec["d2b"])  # (B, W)
    x_fake = _mobius_head(xdec, dec["mw"], dec["mb"]) if hyperbolic else xdec

    interp_x = a_x * x + (1.0 - a_x) * x_fake
    interp_z = a_z * z_z + (1.0 - a_z) * z_enc
    bigx = jnp.concatenate([x, x_fake, interp_x], axis=0)
    bigz = jnp.concatenate([z_enc, z_z, interp_z], axis=0)
    return bigx, bigz


def _kernel_full(B, cx_rate, cz_rate, hyperbolic, n_enc, n_dec, refs):
    """Whole critic step in one kernel. ``refs`` laid out as:
    [x, z_x, a_x, z_z, a_z, m_dec, mx, mz,
     <n_enc encoder arrays>, <n_dec decoder arrays>,
     <10 critic_x arrays>, <6 critic_z arrays>,
     <18 output refs as in _kernel>]."""
    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

    (x_ref, zx_ref, ax_ref, zz_ref, az_ref, md_ref, mx_ref, mz_ref) = take(8)
    enc_flat = [r[:] for r in take(n_enc)]
    dec_flat = [r[:] for r in take(n_dec)]
    cx_flat = [r[:] for r in take(10)]
    cz_flat = [r[:] for r in take(6)]
    outs = list(it)

    enc = {
        "lstm": {"w_ih": enc_flat[0], "b_ih": enc_flat[1],
                 "b_hh": enc_flat[2], "w_ih_rev": enc_flat[3],
                 "b_ih_rev": enc_flat[4], "b_hh_rev": enc_flat[5]},
        "dw": enc_flat[6], "db": enc_flat[7],
    }
    dec = {
        "d1w": dec_flat[0], "d1b": dec_flat[1],
        "l1": {"w_ih": dec_flat[2], "b_ih": dec_flat[3],
               "b_hh": dec_flat[4], "w_ih_rev": dec_flat[5],
               "b_ih_rev": dec_flat[6], "b_hh_rev": dec_flat[7]},
        "l2": {"w_ih": dec_flat[8], "b_ih": dec_flat[9],
               "b_hh": dec_flat[10], "w_ih_rev": dec_flat[11],
               "b_ih_rev": dec_flat[12], "b_hh_rev": dec_flat[13]},
        "d2w": dec_flat[14], "d2b": dec_flat[15],
    }
    if hyperbolic:
        dec["mw"], dec["mb"] = dec_flat[16], dec_flat[17]

    bigx, bigz = _gen_forward(x_ref[:], zx_ref[:], ax_ref[:], zz_ref[:],
                              az_ref[:], md_ref[:], enc, dec, hyperbolic)

    (lx_ref, lz_ref,
     gxW1, gxb1, gxW2, gxb2, gxW3, gxb3, gxW4, gxb4, gxW5, gxb5,
     gzW1, gzb1, gzW2, gzb2, gzW3, gzb3) = outs

    lx, gWs, gbs, gWo, gbo = _critic_grads(
        bigx, [cx_flat[0], cx_flat[2], cx_flat[4], cx_flat[6]],
        [cx_flat[1], cx_flat[3], cx_flat[5], cx_flat[7]],
        cx_flat[8], cx_flat[9],
        [mx_ref[i] for i in range(4)], cx_rate, B, sign=+1.0)
    lx_ref[:] = jnp.full((1, 1), lx)
    for ref, val in zip((gxW1, gxW2, gxW3, gxW4), gWs):
        ref[:] = val
    for ref, val in zip((gxb1, gxb2, gxb3, gxb4), gbs):
        ref[:] = val
    gxW5[:] = gWo
    gxb5[:] = gbo

    lz, gWs, gbs, gWo, gbo = _critic_grads(
        bigz, [cz_flat[0], cz_flat[2]], [cz_flat[1], cz_flat[3]],
        cz_flat[4], cz_flat[5],
        [mz_ref[i] for i in range(2)], cz_rate, B, sign=-1.0)
    lz_ref[:] = jnp.full((1, 1), lz)
    for ref, val in zip((gzW1, gzW2), gWs):
        ref[:] = val
    for ref, val in zip((gzb1, gzb2), gbs):
        ref[:] = val
    gzW3[:] = gWo
    gzb3[:] = gbo


def _lstm_flat(layer):
    return [layer["w_ih"], layer["b_ih"].reshape(1, -1),
            layer["b_hh"].reshape(1, -1), layer["w_ih_rev"],
            layer["b_ih_rev"].reshape(1, -1),
            layer["b_hh_rev"].reshape(1, -1)]


@functools.partial(jax.jit,
                   static_argnames=("hyperbolic", "interpret"))
def _full_impl(params, x, z_x, a_x, z_z, a_z, m_dec, mx, mz,
               hyperbolic, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x.shape[0]
    f32 = jnp.float32

    enc_p = params["encoder"]
    dec_p = params["decoder"]
    enc_flat = _lstm_flat(enc_p["lstm"][0]) + [
        enc_p["dense"]["w"], enc_p["dense"]["b"].reshape(1, -1)]
    dec_flat = ([dec_p["dense1"]["w"], dec_p["dense1"]["b"].reshape(1, -1)]
                + _lstm_flat(dec_p["lstm"][0])
                + _lstm_flat(dec_p["lstm"][1])
                + [dec_p["dense2"]["w"], dec_p["dense2"]["b"].reshape(1, -1)])
    if hyperbolic:
        hl = dec_p["hyperbolic_linear"]
        dec_flat += [hl["w"], hl["b"].reshape(1, -1)]

    def flat(p, layers):
        arrs = []
        for name in layers:
            arrs += [p[name]["w"].astype(f32),
                     p[name]["b"].astype(f32).reshape(1, -1)]
        return arrs

    cx_flat = flat(params["critic_x"], _CX_LAYERS)
    cz_flat = flat(params["critic_z"], _CZ_LAYERS)

    inputs = ([x.astype(f32), z_x.astype(f32), a_x.astype(f32),
               z_z.astype(f32), a_z.astype(f32),
               m_dec.astype(f32).reshape(B, -1),
               mx.astype(f32), mz.astype(f32)]
              + [a.astype(f32) for a in enc_flat + dec_flat]
              + cx_flat + cz_flat)

    out_shape = ([jax.ShapeDtypeStruct((1, 1), f32)] * 2
                 + [jax.ShapeDtypeStruct(a.shape, f32)
                    for a in cx_flat + cz_flat])
    outs = pl.pallas_call(
        _kernel_full_wrapper(B, CX_DROPOUT, CZ_DROPOUT,
                             hyperbolic, len(enc_flat), len(dec_flat)),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        interpret=interpret,
    )(*inputs)

    lx = outs[0][0, 0]
    lz = outs[1][0, 0]

    def tree(flat_outs, layers, p):
        t = {}
        for i, name in enumerate(layers):
            t[name] = {"w": flat_outs[2 * i],
                       "b": flat_outs[2 * i + 1].reshape(p[name]["b"].shape)}
        return t

    gx = tree(outs[2: 2 + 2 * len(_CX_LAYERS)], _CX_LAYERS,
              params["critic_x"])
    gz = tree(outs[2 + 2 * len(_CX_LAYERS):], _CZ_LAYERS,
              params["critic_z"])
    return lx, lz, gx, gz


def _kernel_full_wrapper(B, cx_rate, cz_rate, hyperbolic, n_enc, n_dec):
    def kernel(*refs):
        _kernel_full(B, cx_rate, cz_rate, hyperbolic, n_enc, n_dec, refs)
    return kernel


def critic_step_fused_full(params, x, draws, hyperbolic, interpret=None):
    """The ENTIRE critic step body (generator forwards + both critics'
    value_and_grad) as one TPU kernel. ``draws``: the trainer's pregenerated
    per-step slice (z_x, a_x, z_z, a_z, m_cx, m_cz, m_dec). Returns
    (lx, lz, grads_cx, grads_cz); the Adam updates stay outside."""
    if interpret is None:
        interpret = "TPU" not in jax.devices()[0].device_kind.upper()
    return _full_impl(params, x, draws["z_x"], draws["a_x"], draws["z_z"],
                      draws["a_z"], draws["m_dec"], draws["m_cx"],
                      draws["m_cz"], hyperbolic, interpret)
