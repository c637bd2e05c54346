"""Package-hygiene checks — the Python analog of the reference's Aqua.jl
QA testset (``test/test_aqua.jl``: ambiguities, stale exports, undocumented
names).
"""

import importlib
import pkgutil
import types

import thunderbolt_tpu as tb


def test_every_submodule_imports():
    """Deep-import every module in the package (stale imports, syntax
    errors, import-time side effects that raise)."""
    failures = []
    for info in pkgutil.walk_packages(tb.__path__, prefix="thunderbolt_tpu."):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001 - collect all failures
            failures.append((info.name, repr(e)))
    assert not failures, failures


def test_public_names_resolve_and_are_documented():
    """Every public top-level name resolves and carries a docstring
    (functions/classes; submodules and data are exempt)."""
    missing = []
    for name in dir(tb):
        if name.startswith("_"):
            continue
        obj = getattr(tb, name)
        if isinstance(obj, types.ModuleType):
            continue
        if callable(obj) or isinstance(obj, type):
            if not (obj.__doc__ or "").strip():
                missing.append(name)
    assert not missing, f"undocumented public names: {missing}"


def test_no_duplicate_exports_shadowing():
    """A public name must mean ONE thing: the object reachable as
    tb.<name> is the same object as in its defining module."""
    for name in dir(tb):
        if name.startswith("_"):
            continue
        obj = getattr(tb, name)
        mod = getattr(obj, "__module__", None)
        if not (mod or "").startswith("thunderbolt_tpu"):
            continue
        defining = importlib.import_module(mod)
        assert getattr(defining, getattr(obj, "__name__", name), obj) is obj, \
            f"{name} shadowed between {mod} and package root"
