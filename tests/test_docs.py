"""Documentation-surface gates.

Sphinx is not installed in this image, so instead of building the site the
suite asserts the properties the build relies on: every symbol referenced
in ``docs/source/api.rst`` resolves, every public export carries a
docstring, and every export appears in the API reference (the reference
ships a full readthedocs autodoc site; `/root/reference/docs/source/`)."""
import ast
import os
import re

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
_RST = os.path.join(_ROOT, "docs", "source", "api.rst")


def _exports():
    src = open(os.path.join(_ROOT, "dgp_tpu", "__init__.py")).read()
    names = set()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    return {n for n in names if not n.startswith("_") and n != "config"}


def _rst_refs():
    rst = open(_RST).read()
    auto = re.findall(r"\.\. auto(?:class|function):: ([\w.]+)", rst)
    mods = re.findall(
        r"\.\. automodule:: ([\w.]+)\n(?:\s+:members:\s*([\w, ]*))?", rst)
    return auto, mods


def test_api_rst_symbols_resolve_with_docstrings():
    import importlib
    auto, mods = _rst_refs()
    assert auto, "api.rst lists no autodoc directives"
    for dotted in auto:
        parts = dotted.split(".")
        obj = importlib.import_module(parts[0])
        for p in parts[1:]:
            obj = getattr(obj, p)
        assert (obj.__doc__ or "").strip(), f"{dotted} has no docstring"
    for mod, members in mods:
        m = importlib.import_module(mod)
        assert (m.__doc__ or "").strip(), f"{mod} has no module docstring"
        for name in filter(None, re.split(r"[,\s]+", members or "")):
            obj = getattr(m, name)
            assert (obj.__doc__ or "").strip(), f"{mod}.{name} undocumented"


def test_every_export_in_api_reference():
    rst = open(_RST).read()
    covered = set(re.findall(r"dgp_tpu\.(\w+)", rst))
    missing = _exports() - covered
    assert not missing, f"exports missing from docs/source/api.rst: {missing}"


def test_every_export_has_docstring():
    import dgp_tpu
    undocumented = [n for n in _exports()
                    if not (getattr(dgp_tpu, n).__doc__ or "").strip()]
    assert not undocumented, undocumented
