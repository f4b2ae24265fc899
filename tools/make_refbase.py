#!/usr/bin/env python3
"""Rebuild the reference baseline sandbox at /tmp/refbase.

The reference (aleflabo/HypAD, read-only at /root/reference) targets
torch-1.9-era CUDA + geoopt 0.5.0 + pyts, none of which are installed
here. This script materializes a runnable PyTorch-CPU sandbox:

  /tmp/refbase/
    *.py, configs/, hyperspace/, models/, utils/, assets/   (copied code)
    data -> /root/reference/data                             (symlink)
    shims/                                                   (PYTHONPATH)
      sitecustomize.py   .cuda() no-ops, torch.jit.script disabled,
                         scipy integrate.trapz alias
      geoopt/            ManifoldParameter, PoincareBall, optim.RiemannianAdam
                         (geoopt-0.5.0 semantics re-derived from the vendored
                         math spec; ``geoopt.manifolds.stereographic.math`` is
                         the reference's own math_.py executed in-package so
                         the numerical spec is the reference's, not ours)
      pyts/              metrics.dtw = classic DTW, squared cost, final sqrt
                         (pyts defaults, as used at
                         utils/anomaly_detection_utils.py:853)
      torchvision/       import-only stub (hyperspace/utils.py:12)

Run a reference config:
  cd /tmp/refbase && PYTHONPATH=/tmp/refbase/shims python main.py --config <yaml>

Used to produce every reference-side number in BASELINE.md / PARITY.md.
"""

import os
import shutil
import sys

REF = "/root/reference"
BASE = os.environ.get("REFBASE", "/tmp/refbase")

SITECUSTOMIZE = '''\
"""Sandbox compatibility patches, applied at interpreter start."""
import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
if not hasattr(torch.cuda, "FloatTensor"):
    torch.cuda.FloatTensor = torch.FloatTensor

# math_.py decorates with @torch.jit.script; the TorchScript frontend cannot
# parse that 1.9-era code under modern torch. Eager semantics are identical.
torch.jit.script = lambda fn=None, *a, **k: fn

# the reference targets scipy<1.14 where integrate.trapz still existed
import scipy.integrate as _si
if not hasattr(_si, "trapz"):
    _si.trapz = np.trapezoid
'''

PYTS_INIT = "from . import metrics\n"

PYTS_METRICS = '''\
"""pyts.metrics.dtw stand-in: classic DTW, squared local cost, sqrt of the
terminal accumulated cost (pyts documented defaults)."""
import numpy as np


def dtw(x, y, dist="square", method="classic", options=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, m = len(x), len(y)
    cost = (x[:, None] - y[None, :]) ** 2
    acc = np.full((n, m), np.inf)
    acc[0, 0] = cost[0, 0]
    for j in range(1, m):
        acc[0, j] = acc[0, j - 1] + cost[0, j]
    for i in range(1, n):
        acc[i, 0] = acc[i - 1, 0] + cost[i, 0]
        for j in range(1, m):
            acc[i, j] = cost[i, j] + min(acc[i - 1, j], acc[i, j - 1],
                                         acc[i - 1, j - 1])
    return float(np.sqrt(acc[-1, -1]))
'''

TORCHVISION_INIT = '''\
"""Import-only torchvision stub (hyperspace/utils.py:12 imports transforms
from a wildcard-imported module; nothing on the executed paths uses it)."""
import types

transforms = types.ModuleType("torchvision.transforms")
'''

GEOOPT_UTILS = '''\
"""The five geoopt-0.5.0 helpers math_.py imports via ``from ...utils``."""
import torch


def sabs(x, eps=1e-15):
    return x.abs().clamp_min(eps)


def sign(x):
    return torch.sign(x.sign() + 0.5)


def clamp_abs(x, eps=1e-15):
    return sign(x) * sabs(x, eps=eps)


def list_range(end):
    return [d for d in range(end)]


def drop_dims(tensor, dims):
    seen = 0
    for d in dims:
        tensor = tensor.squeeze(d - seen)
        seen += 1
    return tensor
'''

GEOOPT_STEREO_INIT = '''\
import torch as _torch

from . import math


class _TorchProxy:
    """math_.py calls tensordot with TorchScript's 4-positional-arg form
    (a, b, dims_self, dims_other) and negative dims; translate to the
    modern eager signature."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, attr):
        return getattr(self._real, attr)

    def tensordot(self, a, b, *args, **kw):
        if len(args) == 2:
            da = [d % a.dim() for d in args[0]]
            db = [d % b.dim() for d in args[1]]
            return self._real.tensordot(a, b, dims=(da, db))
        return self._real.tensordot(a, b, *args, **kw)


math.torch = _TorchProxy(_torch)
'''

GEOOPT_INIT = '''\
"""geoopt stand-in exposing exactly the surface HypAD uses:
ManifoldParameter, PoincareBall, optim.RiemannianAdam, and
``geoopt.manifolds.stereographic.math`` (the executed vendored spec)."""
import torch

from . import manifolds
from .manifolds.stereographic import math as _gmath
from . import optim


class ManifoldParameter(torch.nn.Parameter):
    def __new__(cls, data=None, manifold=None, requires_grad=True):
        p = super().__new__(cls, data, requires_grad)
        p.manifold = manifold
        return p

    def __reduce_ex__(self, proto):
        return _rebuild_manifold_parameter, (
            self.data, self.manifold, self.requires_grad)


def _rebuild_manifold_parameter(data, manifold, requires_grad):
    return ManifoldParameter(data, manifold=manifold,
                             requires_grad=requires_grad)


class PoincareBall:
    """Methods used by MobiusLinear init and RiemannianAdam, delegating to
    the executed math spec (k = -c)."""

    def __init__(self, c=1.0):
        self.c = torch.as_tensor(c, dtype=torch.get_default_dtype())
        self.k = -self.c

    def expmap0(self, u, project=True):
        res = _gmath.expmap0(u, k=self.k)
        return _gmath.project(res, k=self.k) if project else res

    def projx(self, x):
        return _gmath.project(x, k=self.k)

    def proju(self, x, u):
        return u

    def egrad2rgrad(self, x, u):
        return _gmath.egrad2rgrad(x, u, k=self.k)

    def retr(self, x, u):
        return _gmath.project(x + u, k=self.k)

    def transp(self, x, y, v):
        return _gmath.parallel_transport(x, y, v, k=self.k)

    def retr_transp(self, x, u, v):
        y = self.retr(x, u)
        return y, self.transp(x, y, v)

    def component_inner(self, x, u, v=None):
        v = u if v is None else v
        lam = _gmath.lambda_x(x, k=self.k, keepdim=True)
        return (lam ** 2 * (u * v).sum(-1, keepdim=True)).expand_as(u)
'''

GEOOPT_OPTIM = '''\
"""geoopt.optim.RiemannianAdam with 0.5.0 semantics (the reference's
hyperbolic generator optimizer, train.py:283-288): weight decay on the raw
gradient, egrad2rgrad rescale + component_inner second moment + expmap/retr
update + parallel-transported first moment for manifold parameters, plain
Adam for Euclidean ones, projx stabilization every ``stabilize`` steps."""
import torch


class RiemannianAdam(torch.optim.Optimizer):
    def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=0.0, stabilize=None, amsgrad=False):
        defaults = dict(lr=lr, betas=betas, eps=eps,
                        weight_decay=weight_decay, stabilize=stabilize)
        super().__init__(params, defaults)

    @torch.no_grad()
    def step(self, closure=None):
        loss = None
        if closure is not None:
            with torch.enable_grad():
                loss = closure()
        for group in self.param_groups:
            b1, b2 = group["betas"]
            lr, eps = group["lr"], group["eps"]
            wd, stabilize = group["weight_decay"], group["stabilize"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                manifold = getattr(p, "manifold", None)
                state = self.state[p]
                if not state:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p)
                    state["exp_avg_sq"] = torch.zeros_like(p)
                state["step"] += 1
                step = state["step"]
                exp_avg, exp_avg_sq = state["exp_avg"], state["exp_avg_sq"]
                grad = p.grad.add(p, alpha=wd)
                if manifold is not None:
                    grad = manifold.egrad2rgrad(p, grad)
                    inner = manifold.component_inner(p, grad)
                else:
                    inner = grad * grad
                exp_avg.mul_(b1).add_(grad, alpha=1 - b1)
                exp_avg_sq.mul_(b2).add_(inner, alpha=1 - b2)
                bc1 = 1 - b1 ** step
                bc2 = 1 - b2 ** step
                denom = (exp_avg_sq / bc2).sqrt().add_(eps)
                direction = (exp_avg / bc1) / denom
                if manifold is not None:
                    new_p, new_m = manifold.retr_transp(
                        p, -lr * direction, exp_avg)
                    p.copy_(new_p)
                    exp_avg.copy_(new_m)
                    if stabilize is not None and step % stabilize == 0:
                        p.copy_(manifold.projx(p))
                else:
                    p.add_(direction, alpha=-lr)
        return loss
'''


def main():
    if os.path.exists(BASE):
        shutil.rmtree(BASE)
    os.makedirs(BASE)

    # reference code (never edited — shims do all adaptation)
    for name in os.listdir(REF):
        src = os.path.join(REF, name)
        if name == "data":
            os.symlink(src, os.path.join(BASE, name))
        elif name.endswith((".py", ".yaml", ".json", ".md", ".txt")):
            shutil.copy2(src, BASE)
        elif os.path.isdir(src) and name in ("configs", "hyperspace",
                                             "models", "utils", "assets"):
            shutil.copytree(src, os.path.join(BASE, name))

    # utils/data/ is the reference's S3 download cache (utils/data.py:26);
    # seed it so load_anomalies() never reaches for the network (no egress)
    s3_cache = os.path.join(BASE, "utils", "data")
    os.makedirs(s3_cache, exist_ok=True)
    shutil.copy2(os.path.join(REF, "data", "anomalies.csv"), s3_cache)

    shims = os.path.join(BASE, "shims")
    geoopt = os.path.join(shims, "geoopt")
    stereo = os.path.join(geoopt, "manifolds", "stereographic")
    pyts = os.path.join(shims, "pyts")
    tv = os.path.join(shims, "torchvision")
    for d in (stereo, pyts, tv):
        os.makedirs(d)

    def write(path, text):
        with open(path, "w") as f:
            f.write(text)

    write(os.path.join(shims, "sitecustomize.py"), SITECUSTOMIZE)
    write(os.path.join(pyts, "__init__.py"), PYTS_INIT)
    write(os.path.join(pyts, "metrics.py"), PYTS_METRICS)
    write(os.path.join(tv, "__init__.py"), TORCHVISION_INIT)
    write(os.path.join(geoopt, "__init__.py"), GEOOPT_INIT)
    write(os.path.join(geoopt, "utils.py"), GEOOPT_UTILS)
    write(os.path.join(geoopt, "optim.py"), GEOOPT_OPTIM)
    write(os.path.join(geoopt, "manifolds", "__init__.py"),
          "from . import stereographic\n")
    write(os.path.join(stereo, "__init__.py"), GEOOPT_STEREO_INIT)
    # math_.py's ``from ...utils import ...`` resolves to geoopt.utils here,
    # so the vendored spec runs verbatim as geoopt.manifolds.stereographic.math
    shutil.copy2(os.path.join(REF, "math_.py"),
                 os.path.join(stereo, "math.py"))

    print(f"refbase ready at {BASE}")
    print(f"  cd {BASE} && PYTHONPATH={shims} python main.py --config "
          "configs/univariate.yaml")


if __name__ == "__main__":
    main()
