"""Every package module must import cleanly (catches stale relative
imports in rarely-exercised modules, e.g. archived experiments)."""

import importlib
import pkgutil

import opengl_raytracing_tpu as pkg


def test_all_modules_import():
    failures = []
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        if m.name.endswith(".libortnative"):
            continue  # compiled artifact namespace, not a python module
        try:
            importlib.import_module(m.name)
        except Exception as exc:  # pragma: no cover
            failures.append((m.name, repr(exc)))
    assert not failures, failures
