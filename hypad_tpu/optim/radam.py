"""Riemannian Adam for the Poincare ball — optax-style, TPU-native.

Re-derives the geoopt 0.5.0 ``RiemannianAdam`` semantics (used by the
reference when hyperbolic, ``train.py:283-288``) from the vendored math spec:

  per step, for every parameter leaf (Euclidean leaves live on the Euclidean
  manifold, where every manifold op degenerates to the identity / plain add):

    1. grad += weight_decay * p                      (L2, applied to ALL leaves)
    2. rgrad = egrad2rgrad(p, grad)                  (math_.py:1843-1845:
                                                      grad / lambda_x^2; identity
                                                      for Euclidean leaves)
    3. m  = b1*m + (1-b1)*rgrad
    4. v  = b2*v + (1-b2)*component_inner(p, rgrad)  (PoincareBall: the full
              Riemannian inner lambda^2*||rgrad||^2 broadcast over components —
              geoopt Manifold.component_inner default; Euclidean: rgrad^2)
    5. denom = sqrt(v / bc2) + eps
    6. dir = (m / bc1) / denom
    7. p_new = retr(p, -lr * dir)                    (PoincareBall.retr =
                                                      project(p + u); Euclidean:
                                                      p + u)
    8. m = parallel_transport(p, p_new, m)           (math_.py:1739-1745;
                                                      identity for Euclidean)
    9. every ``stabilize`` steps: p = project(p)     (proju is the identity on
                                                      the ball, so momenta are
                                                      left untouched)

The only manifold parameter in the HypAD model family is the MobiusLinear
bias (reference hyperspace/hyrnn_nets.py:167-173); :func:`manifold_mask`
tags it in the parameter pytree.

Unlike optax's additive-update contract, the retraction is not an addition,
so this transform exposes ``init(params)`` and
``update(grads, state, params) -> (new_params, new_state)`` directly. It is
jit-friendly and vmap/shard_map-safe (pure functions of pytrees).
"""

from __future__ import annotations

import itertools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from hypad_tpu.manifold import stereographic as st


class RAdamState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    mu: Any                    # first moments (pytree like params)
    nu: Any                    # second moments (pytree like params)


def manifold_mask(params):
    """Boolean pytree: True on Poincare-ball leaves.

    HypAD's only manifold parameter is ``decoder/hyperbolic_linear/b``
    (reference hyperspace/hyrnn_nets.py:170). Matches any leaf whose path
    contains a dict key ``hyperbolic_linear`` with leaf key ``b``.
    """
    def mark(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        return "hyperbolic_linear" in keys and keys[-1] == "b"

    return jax.tree_util.tree_map_with_path(mark, params)


class RiemannianAdam(NamedTuple):
    """Bundled init/update pair (optax-flavoured API with non-additive update)."""
    init: Any
    update: Any


def riemannian_adam(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
                    stabilize=None, mask=None, k=-1.0):
    """Build the optimizer.

    Args:
      lr/b1/b2/eps: Adam hyperparameters (reference uses torch defaults,
        betas=(0.9, 0.999), train.py:274-288).
      weight_decay: L2 added to the gradient (1e-5 for the hyperbolic
        generator, train.py:286).
      stabilize: re-project ball parameters every N steps (10 in the
        reference, train.py:287); None disables.
      mask: boolean pytree marking manifold leaves; defaults to
        :func:`manifold_mask` of the params at init time.
      k: ball curvature.
    """

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                          nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        if mask is False:  # sentinel used by :func:`adam`: no manifold leaves
            m = _all_false_like(params)
        elif mask is not None:
            m = mask
        else:
            m = manifold_mask(params)
        step = state.step + 1
        bc1 = 1.0 - b1 ** step.astype(jnp.float32)
        bc2 = 1.0 - b2 ** step.astype(jnp.float32)

        def leaf_update(is_manifold, p, g, mu, nu):
            g = g + weight_decay * p
            if is_manifold:
                rg = st.egrad2rgrad(p, g, k)
                inner = st.lambda_x(p, k, keepdims=True) ** 2 * jnp.sum(
                    rg * rg, axis=-1, keepdims=True
                )
                inner = jnp.broadcast_to(inner, rg.shape)
            else:
                rg = g
                inner = rg * rg
            mu_new = b1 * mu + (1.0 - b1) * rg
            nu_new = b2 * nu + (1.0 - b2) * inner
            denom = jnp.sqrt(nu_new / bc2) + eps
            direction = (mu_new / bc1) / denom
            upd = -lr * direction
            if is_manifold:
                p_new = st.retr(p, upd, k)
                mu_new = st.parallel_transport(p, p_new, mu_new, k)
                if stabilize is not None:
                    do_proj = (step % stabilize) == 0
                    p_new = jnp.where(do_proj, st.project(p_new, k), p_new)
            else:
                p_new = p + upd
            return p_new, mu_new, nu_new

        flat_params, treedef = jax.tree_util.tree_flatten(params)
        flat_grads = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_mask = treedef.flatten_up_to(m)

        new_p, new_mu, new_nu = [], [], []
        for im, p, g, mu_, nu_ in zip(flat_mask, flat_params, flat_grads,
                                      flat_mu, flat_nu):
            pn, mn, vn = leaf_update(bool(im), p, g, mu_, nu_)
            new_p.append(pn)
            new_mu.append(mn)
            new_nu.append(vn)

        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            RAdamState(step=step,
                       mu=jax.tree_util.tree_unflatten(treedef, new_mu),
                       nu=jax.tree_util.tree_unflatten(treedef, new_nu)),
        )

    return RiemannianAdam(init=init, update=update)


def adam(lr, b1=0.9, b2=0.999, eps=1e-8):
    """Plain Adam (the critics' optimizer, train.py:274-275) with the same
    non-additive API so the trainer treats all optimizers uniformly.

    TPU note: the moments are stored as ONE flat vector (PackedAdamState) —
    the fused epoch program is kernel-latency-bound and a per-leaf update
    costs ~10 tiny kernels x n_leaves per step; packed, the whole update is
    a handful of vector ops plus one ravel/concat of the incoming grads and
    one split of the outgoing params. Identical per-element arithmetic
    (lockstep vs torch.optim.Adam in tests/test_optim.py)."""

    def init(params):
        leaves = jax.tree_util.tree_leaves(params)
        size = sum(leaf.size for leaf in leaves)
        dtype = jnp.result_type(*leaves)
        return PackedAdamState(step=jnp.zeros((), jnp.int32),
                               mu=jnp.zeros((size,), dtype),
                               nu=jnp.zeros((size,), dtype))

    def update(grads, state, params):
        flat_params, treedef = jax.tree_util.tree_flatten(params)
        flat_grads = treedef.flatten_up_to(grads)
        sizes = [p.size for p in flat_params]
        splits = list(itertools.accumulate(sizes))[:-1]

        step = state.step + 1
        bc1 = 1.0 - b1 ** step.astype(jnp.float32)
        bc2 = 1.0 - b2 ** step.astype(jnp.float32)
        g = jnp.concatenate([x.ravel() for x in flat_grads])
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * g * g
        denom = jnp.sqrt(nu / bc2) + eps
        p_vec = jnp.concatenate([x.ravel() for x in flat_params])
        p_new = p_vec - lr * (mu / bc1) / denom

        new_leaves = [x.reshape(p.shape) for x, p in
                      zip(jnp.split(p_new, splits), flat_params)]
        return (jax.tree_util.tree_unflatten(treedef, new_leaves),
                PackedAdamState(step=step, mu=mu, nu=nu))

    return RiemannianAdam(init=init, update=update)


class PackedAdamState(NamedTuple):
    step: jnp.ndarray   # scalar int32
    mu: jnp.ndarray     # (total_params,) first moments, leaf-concatenated
    nu: jnp.ndarray     # (total_params,) second moments


def _all_false_like(params):
    return jax.tree_util.tree_map(lambda _: False, params)
