"""Test-only loader for the reference implementation at /root/reference.

Imports the reference's scoring module so our device pipeline can be
golden-tested against the original numpy/scipy/pandas implementation.
The reference imports ``pyts`` (not installed here); we register a minimal
numpy stand-in implementing classic DTW with squared local cost and a final
sqrt — pyts.metrics.dtw's documented default behavior.
"""

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def classic_dtw_square(x, y):
    """Classic DTW, squared point cost, sqrt of terminal accumulated cost
    (pyts.metrics.dtw(dist='square', method='classic') semantics)."""
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


def _install_pyts_shim():
    if "pyts" in sys.modules:
        return
    pyts = types.ModuleType("pyts")
    metrics = types.ModuleType("pyts.metrics")
    metrics.dtw = classic_dtw_square
    pyts.metrics = metrics
    sys.modules["pyts"] = pyts
    sys.modules["pyts.metrics"] = metrics


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_math():
    """Execute the reference's vendored math spec (/root/reference/math_.py,
    unimportable in place: its ``from ...utils import ...`` needs a package
    3 levels deep). We scaffold that package, provide the five geoopt-0.5.0
    helpers it imports, and disable torch.jit scripting (semantics only)."""
    name = "refmath.manifolds.stereographic.math_"
    if name in sys.modules:
        return sys.modules[name]
    import torch

    orig_script = torch.jit.script
    torch.jit.script = lambda fn: fn
    try:
        utils = types.ModuleType("refmath.utils")
        utils.sign = lambda x: torch.sign(x.sign() + 0.5)
        utils.sabs = lambda x, eps=1e-15: x.abs().clamp_min(eps)
        utils.clamp_abs = (
            lambda x, eps=1e-15: utils.sign(x) * utils.sabs(x, eps=eps))
        utils.list_range = lambda end: [d for d in range(end)]

        def drop_dims(tensor, dims):
            seen = 0
            for d in dims:
                tensor = tensor.squeeze(d - seen)
                seen += 1
            return tensor

        utils.drop_dims = drop_dims
        for pkg in ("refmath", "refmath.manifolds",
                    "refmath.manifolds.stereographic"):
            mod = types.ModuleType(pkg)
            mod.__path__ = []
            sys.modules[pkg] = mod
        sys.modules["refmath.utils"] = utils
        mod = _load_module(name, REF + "/math_.py")

        # math_.py calls tensordot with TorchScript's 4-positional-arg form
        # (a, b, dims_self, dims_other) and negative dims; give the module a
        # torch proxy translating to the modern eager signature
        class _TorchProxy:
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

        mod.torch = _TorchProxy(torch)
        return mod
    finally:
        torch.jit.script = orig_script


def load_reference_hyrnn():
    """Load the reference's hyperspace/hyrnn_nets.py with a geoopt module
    shim whose ``manifolds.stereographic.math`` is the executed vendored
    spec — enough for the free functions (mobius_gru_cell/loop,
    one_rnn_transform, mobius_linear) used as golden oracles."""
    if "ref_hyrnn" in sys.modules:
        return sys.modules["ref_hyrnn"]
    math_mod = load_reference_math()
    if "geoopt" not in sys.modules:
        geoopt = types.ModuleType("geoopt")
        manifolds = types.ModuleType("geoopt.manifolds")
        stereo = types.ModuleType("geoopt.manifolds.stereographic")
        stereo.math = math_mod
        manifolds.stereographic = stereo
        geoopt.manifolds = manifolds
        sys.modules["geoopt"] = geoopt
        sys.modules["geoopt.manifolds"] = manifolds
        sys.modules["geoopt.manifolds.stereographic"] = stereo
        sys.modules["geoopt.manifolds.stereographic.math"] = math_mod
    return _load_module("ref_hyrnn", REF + "/hyperspace/hyrnn_nets.py")


def load_reference_adu():
    """Load the reference's utils/anomaly_detection_utils.py with its
    package context satisfied."""
    _install_pyts_shim()
    import matplotlib

    matplotlib.use("Agg")
    if "utils" not in sys.modules or not hasattr(sys.modules.get("utils"), "__path__"):
        pkg = types.ModuleType("utils")
        pkg.__path__ = [REF + "/utils"]
        sys.modules["utils"] = pkg
    _load_module("utils.dataloader", REF + "/utils/dataloader.py")
    mod = _load_module("utils.anomaly_detection_utils",
                       REF + "/utils/anomaly_detection_utils.py")
    # the reference targets scipy<1.14 where integrate.trapz still existed;
    # give the loaded module a shim without touching the installed scipy
    if not hasattr(mod.integrate, "trapz"):
        mod.integrate = types.SimpleNamespace(trapz=np.trapezoid)
    return mod
