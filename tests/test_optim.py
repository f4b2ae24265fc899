"""Optimizer tests: Euclidean path vs torch.optim.Adam oracle; manifold path
invariants (stays on ball, descends the loss, stabilize projection)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from hypad_tpu.manifold import stereographic as st
from hypad_tpu.models import tadgan as m
from hypad_tpu.optim.radam import adam, manifold_mask, riemannian_adam


def test_euclidean_matches_torch_adam():
    """Our Adam (no manifold leaves) must track torch.optim.Adam exactly."""
    w0 = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.999))

    params = {"w": jnp.array(w0)}
    opt = adam(1e-2)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.sum(jnp.sin(p["w"]) ** 2) + jnp.sum(p["w"] ** 2) * 0.1

    for _ in range(20):
        topt.zero_grad()
        tl = torch.sum(torch.sin(tw) ** 2) + torch.sum(tw**2) * 0.1
        tl.backward()
        topt.step()

        g = jax.grad(loss_fn)(params)
        params, state = opt.update(g, state, params)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_euclidean_weight_decay_matches_torch_adam_l2():
    w0 = np.random.default_rng(1).standard_normal((4,)).astype(np.float32)
    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=5e-4, weight_decay=1e-5)

    params = {"w": jnp.array(w0)}
    opt = riemannian_adam(5e-4, weight_decay=1e-5, mask=False)
    state = opt.init(params)

    for _ in range(10):
        topt.zero_grad()
        (torch.sum(tw**3)).backward()
        topt.step()
        g = jax.grad(lambda p: jnp.sum(p["w"] ** 3))(params)
        params, state = opt.update(g, state, params)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_manifold_mask_marks_only_mobius_bias():
    key = jax.random.PRNGKey(0)
    params = m.init_tadgan(key, hyperbolic=True)
    gen = {"encoder": params["encoder"], "decoder": params["decoder"]}
    mask = manifold_mask(gen)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    marked = [jax.tree_util.keystr(p) for p, v in leaves if v]
    assert marked == ["['decoder']['hyperbolic_linear']['b']"]
    assert sum(v for _, v in leaves) == 1


def test_manifold_param_stays_on_ball_and_loss_decreases():
    """Optimize a ball point toward a target: must stay inside the ball and
    the geodesic loss must decrease monotonically-ish."""
    key = jax.random.PRNGKey(0)
    target = st.expmap0(jax.random.normal(key, (8,)) * 0.15)
    p0 = st.expmap0(jax.random.normal(jax.random.PRNGKey(1), (8,)) / 400.0)
    params = {"hyperbolic_linear": {"b": p0}}
    opt = riemannian_adam(5e-2, weight_decay=1e-5, stabilize=10)
    state = opt.init(params)

    def loss_fn(p):
        return st.acosh_poincare_distance(p["hyperbolic_linear"]["b"], target)

    losses = []
    for _ in range(200):
        g = jax.grad(loss_fn)(params)
        params, state = opt.update(g, state, params)
        b = params["hyperbolic_linear"]["b"]
        assert float(jnp.linalg.norm(b)) < 1.0
        losses.append(float(loss_fn(params)))

    assert losses[-1] < losses[0] * 0.2


def test_riemannian_rescale_differs_from_euclidean():
    """Near the ball boundary lambda is large so the Riemannian step must be
    much smaller than the Euclidean one (grad/lambda^2 scaling)."""
    p_far = st.project(jnp.full((4,), 10.0))  # near boundary
    params = {"hyperbolic_linear": {"b": p_far}}
    g = {"hyperbolic_linear": {"b": jnp.ones((4,))}}

    opt_m = riemannian_adam(1e-2)
    sm = opt_m.init(params)
    newp_m, _ = opt_m.update(g, sm, params)

    opt_e = riemannian_adam(1e-2, mask=False)
    se = opt_e.init(params)
    newp_e, _ = opt_e.update(g, se, params)

    step_m = float(jnp.linalg.norm(newp_m["hyperbolic_linear"]["b"] - p_far))
    step_e = float(jnp.linalg.norm(newp_e["hyperbolic_linear"]["b"] - p_far))
    # first Adam step is ~lr in the euclidean case; Riemannian one is damped
    # by 1/lambda^2 inside the inner-product denominator interplay — it must
    # differ substantially (not equal paths)
    assert abs(step_m - step_e) / max(step_m, step_e) > 0.05


def test_update_is_jittable():
    key = jax.random.PRNGKey(0)
    params = {"a": jax.random.normal(key, (3, 3)),
              "hyperbolic_linear": {"b": st.expmap0(jnp.ones(5) * 0.01)}}
    opt = riemannian_adam(1e-3, weight_decay=1e-5, stabilize=10)
    state = opt.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    upd = jax.jit(opt.update)
    params2, state2 = upd(g, state, params)
    assert int(state2.step) == 1
    assert float(jnp.linalg.norm(params2["hyperbolic_linear"]["b"])) < 1.0

