"""Fused MobiusLinear Pallas kernel: forward/gradient equivalence with the
jnp composition (interpreter mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypad_tpu.manifold.kernels import mobius_linear_fused
from hypad_tpu.models.tadgan import init_mobius_linear, mobius_linear


@pytest.mark.parametrize("B,D", [(64, 100), (5, 100), (130, 64)])
def test_fused_forward_matches_jnp(B, D):
    p = init_mobius_linear(jax.random.PRNGKey(0), D, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, D),
                           minval=-1.0, maxval=1.0)
    want = np.asarray(mobius_linear(p, x))
    got = np.asarray(mobius_linear_fused(p, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fused_forward_large_inputs_projected():
    p = init_mobius_linear(jax.random.PRNGKey(0), 100, 100)
    p = dict(p, w=p["w"] * 1e6)  # force outputs at the ball boundary
    x = jnp.ones((8, 100))
    out = np.asarray(mobius_linear_fused(p, x, interpret=True))
    want = np.asarray(mobius_linear(p, x))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-7)
    assert np.all(np.linalg.norm(out, axis=-1) <= 1 - 4e-3 + 1e-6)


def test_fused_gradients_match_jnp():
    p = init_mobius_linear(jax.random.PRNGKey(0), 100, 100)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 100),
                           minval=-1.0, maxval=1.0)
    target = mobius_linear(init_mobius_linear(jax.random.PRNGKey(2), 100, 100),
                           x)

    def loss_fused(p_, x_):
        return jnp.sum((mobius_linear_fused(p_, x_, interpret=True)
                        - target) ** 2)

    def loss_jnp(p_, x_):
        return jnp.sum((mobius_linear(p_, x_) - target) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
