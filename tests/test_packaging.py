"""Packaging surface: pyproject metadata stays consistent with the code
(the install itself is smoke-tested manually — see README 'Install')."""

import importlib
import os
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_entry_point_resolves():
    proj = _load_pyproject()["project"]
    target = proj["scripts"]["hypad"]
    mod_name, func_name = target.split(":")
    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_declared_dependencies_importable():
    """Every declared runtime dependency imports in this environment — the
    dependency set is real, not aspirational."""
    import_names = {"pyyaml": "yaml", "orbax-checkpoint": "orbax.checkpoint"}
    proj = _load_pyproject()["project"]
    for dep in proj["dependencies"]:
        name = dep.split(">=")[0].split("==")[0].strip()
        importlib.import_module(import_names.get(name, name))


def test_package_discovizable():
    """The package-find include pattern covers every hypad_tpu subpackage
    directory actually on disk."""
    pkg_root = os.path.join(ROOT, "hypad_tpu")
    for entry in os.listdir(pkg_root):
        full = os.path.join(pkg_root, entry)
        if os.path.isdir(full) and not entry.startswith("__"):
            assert os.path.exists(os.path.join(full, "__init__.py")), entry
