"""Cross-framework parity: full model forwards and the WGAN-GP second-order
gradient against an independent torch replica carrying our weights.

The torch modules here are built from scratch in the test (torch.nn
primitives only) to mirror the reference architecture
(models/tadgan.py:10-132) — they are an oracle, not a port."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from hypad_tpu.models import tadgan as m
from hypad_tpu.train.trainer import _whole_batch_gp


def _torch_linear(p):
    lin = torch.nn.Linear(p["w"].shape[1], p["w"].shape[0])
    lin.weight.data = torch.tensor(np.asarray(p["w"]))
    lin.bias.data = torch.tensor(np.asarray(p["b"]))
    return lin


def _torch_lstm(params, input_size, hidden, layers, bidir):
    lstm = torch.nn.LSTM(input_size, hidden, num_layers=layers,
                         bidirectional=bidir)
    sd = {}
    for li, layer in enumerate(params):
        for suffix, tsuf in (("", ""), ("_rev", "_reverse")):
            if "w_ih" + suffix not in layer:
                continue
            sd[f"weight_ih_l{li}{tsuf}"] = torch.tensor(
                np.asarray(layer["w_ih" + suffix]))
            sd[f"weight_hh_l{li}{tsuf}"] = torch.tensor(
                np.asarray(layer["w_hh" + suffix]))
            sd[f"bias_ih_l{li}{tsuf}"] = torch.tensor(
                np.asarray(layer["b_ih" + suffix]))
            sd[f"bias_hh_l{li}{tsuf}"] = torch.tensor(
                np.asarray(layer["b_hh" + suffix]))
    lstm.load_state_dict(sd)
    return lstm


class TorchEncoder(torch.nn.Module):
    def __init__(self, p):
        super().__init__()
        self.lstm = _torch_lstm(p["lstm"], 100, 50, 1, True)
        self.dense = _torch_linear(p["dense"])

    def forward(self, x):
        h, _ = self.lstm(x.view(1, -1, 100))
        return self.dense(h)[0]


class TorchDecoder(torch.nn.Module):
    def __init__(self, p):
        super().__init__()
        self.dense1 = _torch_linear(p["dense1"])
        self.lstm = _torch_lstm(p["lstm"], 50, 64, 2, True)
        self.dense2 = _torch_linear(p["dense2"])

    def forward(self, z):
        h = self.dense1(z)[None]
        h, _ = self.lstm(h)
        return torch.tanh(self.dense2(h))[0]


class TorchCriticX(torch.nn.Module):
    def __init__(self, p):
        super().__init__()
        self.layers = torch.nn.ModuleList(
            [_torch_linear(p[f"dense{i}"]) for i in range(1, 6)])

    def forward(self, x):
        h = x
        for lin in self.layers[:-1]:
            h = torch.nn.functional.leaky_relu(lin(h), 0.2)
        return self.layers[-1](h)


def test_full_generator_forward_matches_torch():
    params = m.init_tadgan(jax.random.PRNGKey(0), hyperbolic=False)
    x = np.random.default_rng(0).uniform(-1, 1, (32, 100)).astype(np.float32)

    z = m.encoder_apply(params["encoder"], jnp.array(x))
    recon = m.decoder_apply(params["decoder"], z)

    te = TorchEncoder(params["encoder"]).eval()
    td = TorchDecoder(params["decoder"]).eval()
    with torch.no_grad():
        tz = te(torch.tensor(x))
        trecon = td(tz)
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon), trecon.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_whole_batch_gp_matches_torch_autograd():
    """The GP including second-order autodiff and the whole-batch-flattened
    norm quirk must equal torch's autograd.grad computation."""
    params = m.init_tadgan(jax.random.PRNGKey(1), hyperbolic=False)
    interp = np.random.default_rng(1).uniform(
        -1, 1, (16, 100)).astype(np.float32)

    gp = _whole_batch_gp(
        lambda t: m.critic_x_apply(params["critic_x"], t), jnp.array(interp))

    tc = TorchCriticX(params["critic_x"]).eval()
    t_interp = torch.tensor(interp, requires_grad=True)
    out = tc(t_interp)
    grads = torch.autograd.grad(
        outputs=out, inputs=t_interp,
        grad_outputs=torch.ones_like(out), create_graph=True)[0]
    g = grads.view(1, -1)  # reference flattening quirk (train.py:61,:85)
    gn = torch.sqrt(torch.sum(g**2, dim=1) + 1e-12)
    want = ((gn - 1.0) ** 2).mean()
    np.testing.assert_allclose(float(gp), float(want), rtol=1e-4)


def test_wasserstein_terms_match_torch():
    params = m.init_tadgan(jax.random.PRNGKey(2), hyperbolic=False)
    rng = np.random.default_rng(2)
    real = rng.uniform(-1, 1, (16, 100)).astype(np.float32)
    fake = rng.uniform(-1, 1, (16, 100)).astype(np.float32)

    mine = (jnp.mean(m.critic_x_apply(params["critic_x"], jnp.array(fake)))
            - jnp.mean(m.critic_x_apply(params["critic_x"], jnp.array(real))))

    tc = TorchCriticX(params["critic_x"]).eval()
    with torch.no_grad():
        valid = tc(torch.tensor(real)).squeeze()
        fk = tc(torch.tensor(fake)).squeeze()
        # reference formulation (train.py:36-41,:99)
        want = (torch.mean(torch.ones_like(fk) * fk)
                + torch.mean(-torch.ones_like(valid) * valid))
    np.testing.assert_allclose(float(mine), float(want), rtol=1e-4, atol=1e-6)
