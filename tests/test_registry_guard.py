"""Static guards against ``@register`` re-pointing.

Round 6 nearly shipped a refactor in which a ``@register("x", ...)``
decorator ended up sitting on the WRONG function — the registry maps the
name to a callable that computes something else, every local test that
calls ``REGISTRY[name].spark`` silently exercises the wrong query, and the
failure only surfaces as a cryptic driver hash mismatch. These tests make
that class of mistake fail fast and by name:

1. the registered callable's ``__name__`` must equal its registry name
   (the repo-wide convention), with the one sanctioned exception of the
   ``strings._register_single`` factory closures, which must carry their
   query name in the captured trailing default arg;
2. a bidirectional AST <-> runtime cross-check: every ``@register("name")``
   decorator found in a query module's source must be registered from that
   module and bound to the exact function the decorator syntactically sits
   on — and every runtime registration must trace back to such a decorator
   (or to the factory). A decorator moved onto a different def, a renamed
   def, or a registration that drifted across modules all fail here.

No SparkSession needed — pure static checks, safe to run first.
"""

from __future__ import annotations

import ast
import importlib
import inspect

from cinegraph_spark.queries import load_all


def _registry():
    return load_all()


def _is_factory_closure(fn) -> bool:
    return "<locals>" in fn.__qualname__


def test_registered_callable_name_matches_registry_name():
    for name, spec in _registry().items():
        fn = spec.spark
        if _is_factory_closure(fn):
            # strings._register_single captures fname as the trailing
            # default arg precisely so this guard can verify the binding
            assert fn.__defaults__, (
                f"{name}: factory closure lost its captured fname default"
            )
            assert name == f"strfn_{fn.__defaults__[-1]}", (
                f"{name}: factory closure captured "
                f"{fn.__defaults__[-1]!r} — decorator re-pointed?"
            )
        else:
            assert fn.__name__ == name, (
                f"registry name {name!r} is bound to function "
                f"{fn.__module__}.{fn.__qualname__} — decorator re-pointed?"
            )


def _ast_declared_registrations(modname: str) -> dict[str, str]:
    """name -> def-name for every ``@register("literal", ...)`` decorator
    in the module's source (non-literal names, i.e. the factory's f-string,
    are intentionally invisible here)."""
    mod = importlib.import_module(modname)
    tree = ast.parse(inspect.getsource(mod))
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for dec in node.decorator_list:
            if not isinstance(dec, ast.Call):
                continue
            callee = dec.func
            callee_name = getattr(callee, "id", None) or getattr(
                callee, "attr", None
            )
            if callee_name != "register":
                continue
            if dec.args and isinstance(dec.args[0], ast.Constant):
                assert dec.args[0].value not in out, (
                    f"{modname}: duplicate @register "
                    f"{dec.args[0].value!r} in source"
                )
                out[dec.args[0].value] = node.name
    return out


def test_ast_decorators_match_runtime_registry():
    reg = _registry()
    runtime_mod = {n: s.spark.__module__ for n, s in reg.items()}
    declared: dict[str, tuple[str, str]] = {}
    for modname in sorted(set(runtime_mod.values())):
        for name, defname in _ast_declared_registrations(modname).items():
            assert name not in declared, (
                f"{name!r} declared in both {declared[name][0]} and {modname}"
            )
            declared[name] = (modname, defname)

    # AST -> runtime: each decorator registered its own def, in its module
    for name, (modname, defname) in declared.items():
        assert name in reg, (
            f"@register({name!r}) in {modname} never reached the registry"
        )
        assert runtime_mod[name] == modname, (
            f"{name!r} declared in {modname} but registered from "
            f"{runtime_mod[name]}"
        )
        fn = reg[name].spark
        assert fn.__name__ == defname, (
            f"{name!r}: decorator sits on def {defname} but the registry "
            f"holds {fn.__qualname__} — decorator re-pointed?"
        )

    # runtime -> AST: nothing registers without a visible decorator
    for name, spec in reg.items():
        if _is_factory_closure(spec.spark):
            continue
        assert name in declared, (
            f"{name!r} registered from {runtime_mod[name]} without a "
            "literal @register decorator — unguarded registration path"
        )


def test_module_register_counts_balance():
    """Per-module totals: the number of @register decorators (plus factory
    closures) in a module equals its registry spec count — a decorator
    deleted or duplicated during a refactor breaks the balance."""
    reg = _registry()
    from collections import Counter

    runtime_counts = Counter(s.spark.__module__ for s in reg.values())
    for modname, n_runtime in sorted(runtime_counts.items()):
        n_ast = len(_ast_declared_registrations(modname))
        n_factory = sum(
            1
            for s in reg.values()
            if s.spark.__module__ == modname and _is_factory_closure(s.spark)
        )
        assert n_ast + n_factory == n_runtime, (
            f"{modname}: {n_ast} literal decorators + {n_factory} factory "
            f"registrations != {n_runtime} registry entries"
        )


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline registry totals rotted every round the
    registry grew (r14 verdict): pin the documented numbers to the live
    registry so the doc can never silently drift again."""
    import os
    import re

    import __spark_entry__ as entry

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(
        r"Registry total: \*\*(\d+) queries, (\d+) with exact SQL "
        r"oracles\*\*",
        doc,
    )
    assert m, "COVERAGE.md lost its 'Registry total' headline line"
    assert int(m.group(1)) == len(entry.queries())
    assert int(m.group(2)) == len(entry.oracle_sql())
    # README carries the same totals in its round-history prose (r16):
    # same drift hazard, same pin
    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m2 = re.search(
        r"registry stands at (\d+) queries, (\d+)\s*\nwith exact SQL "
        r"oracles",
        readme,
    ) or re.search(
        r"registry stands at\s+(\d+) queries, (\d+) with exact SQL",
        readme,
        re.S,
    )
    assert m2, "README.md lost its 'registry stands at' totals line"
    assert int(m2.group(1)) == len(entry.queries())
    assert int(m2.group(2)) == len(entry.oracle_sql())
