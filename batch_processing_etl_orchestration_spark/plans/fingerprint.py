"""Source fingerprints for registered queries (VERDICT r9 next #1).

A driver attestation proves the query CODE that ran, not the query
NAME — r9 rewired ``q_ngram_containment_pairs`` and
``q_exact_span_dedup`` and both kept riding their r8 greens because
the rotation keyed on age alone. The fix: hash each query's source
(the registered fn, which includes its ``@register(...)`` decorator
and therefore the oracle SQL, plus the oracle string explicitly and
one level of direct package callees) and record that hash at the
round of the query's latest green attestation
(``plans/fingerprints.json``, written by ``tools/record_fingerprints
.py`` from the git tree the driver actually tested). A query whose
CURRENT fingerprint differs from its recorded one sorts with the
never-attested queries — ahead of the stalest-first green tail — so
a rewire re-enters the very next driver window.

This module is deliberately STDLIB-ONLY and free of package imports:
the bootstrap tool loads it by file path inside a subprocess whose
``sys.path`` points at a historical git tree, so the same algorithm
fingerprints old code without the current package shadowing the old
one.

Scope note: the hash covers the query fn's own source, its oracle
SQL, and the TRANSITIVE closure of package callees (VERDICT r10 next
#2 — v1 stopped one call level down, so a rewire in a helper's helper
rode an old green; v2 walks ``_direct_package_callees`` recursively
with a visited set, descending through classes via their methods and
package bases). Bump ``ALGO_VERSION`` whenever the hash input
changes — tools/record_fingerprints.py re-records every round's tree
on a version mismatch so stale-algorithm fingerprints never masquerade
as drift (or worse, as stability).
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import textwrap
import types

PKG = "batch_processing_etl_orchestration_spark"

#: Hash-input schema version. v1 = one-level callees; v2 = transitive
#: callee closure (classes descend through methods and package bases);
#: v3 = two review-r11 closure fixes: method sources are dedented
#: before ast.parse (an indented method body raised IndentationError
#: and silently DROPPED its inline `from <pkg> import x` helpers from
#: the closure — e.g. snapshots.py's zorder_by), and functions bound
#: as class attributes but DEFINED elsewhere now join the closure
#: themselves (the class source shows only `handler = helper_fn`).
#: v4 (ADVICE r11 #4): class-attribute descent also covers TYPE-valued
#: attributes (nested or aliased package classes join the closure via
#: _callees_of), functools.partial objects (their .func unwraps), and
#: functools.cached_property wrappers (their .func unwraps) — all
#: three were silently skipped by the plain-function filter before.
#: v5 (review r12): wrapper unwrapping loops to a fixed point and runs
#: BEFORE the type check, so staticmethod-wrapped partials, nested
#: partials, and partial-over-package-class attributes join the
#: closure instead of dying on the single-level elif chain.
ALGO_VERSION = 5


def _direct_package_callees(fn: types.FunctionType) -> list:
    """Functions AND classes one call level below ``fn`` that live in
    our package, sorted by qualified name (deterministic hash input).
    Classes matter as much as functions (review r10): registered
    queries instantiate operator classes directly (PostingsIndex,
    IvfIndex, VersionedTable, ...), and a method rewire must drift the
    query's fingerprint exactly like a helper-function rewire —
    ``inspect.getsource`` of the class covers every method. Two
    discovery routes: (a) module-global names referenced by the fn's
    code object (including nested lambdas/closures), (b) ``from
    <pkg>.x import y`` statements inside the body — the
    registered-query idiom for operator helpers, which never land in
    ``__globals__``."""
    out: dict[str, object] = {}
    names: set[str] = set()
    stack = [fn.__code__]
    while stack:
        code = stack.pop()
        names.update(code.co_names)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    g = getattr(fn, "__globals__", {})
    cands = [g[n] for n in names if n in g]
    try:
        # dedent: a class METHOD's source is indented and raises
        # IndentationError (a SyntaxError) undedented, which silently
        # dropped its inline `from <pkg> import x` helpers (review r11)
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, SyntaxError, TypeError):
        tree = None
    if tree is not None:
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.ImportFrom)
                and node.module
                and node.module.startswith(PKG)
            ):
                try:
                    mod = importlib.import_module(node.module)
                except ImportError:
                    continue
                for alias in node.names:
                    obj = getattr(mod, alias.name, None)
                    if obj is not None:
                        cands.append(obj)
    for obj in cands:
        if isinstance(obj, (types.FunctionType, type)) and getattr(
            obj, "__module__", ""
        ).startswith(PKG):
            out[f"{obj.__module__}.{obj.__qualname__}"] = obj
    return [out[k] for k in sorted(out)]


def _unwrap_wrappers(attr: object) -> object:
    """Strip NESTED wrapper layers (v5: the v4 unwrap was single-level
    `elif`, so `staticmethod(partial(f))` or `partial(partial(f))`
    still hid their innermost callable): staticmethod/classmethod,
    property getters, functools.partial, functools.cached_property —
    looped to a fixed point, bounded against pathological cycles."""
    import functools

    for _ in range(16):
        if isinstance(attr, (staticmethod, classmethod)):
            attr = attr.__func__
        elif isinstance(attr, property):
            attr = attr.fget
        elif isinstance(attr, functools.partial):
            attr = attr.func
        elif isinstance(attr, functools.cached_property):
            attr = attr.func
        else:
            break
    return attr


def _unwrap_method(attr: object) -> types.FunctionType | None:
    """The plain function behind a class attribute, if any."""
    attr = _unwrap_wrappers(attr)
    return attr if isinstance(attr, types.FunctionType) else None


def _callees_of(obj: object) -> list:
    """One level of package callees below ``obj``. Functions reuse
    ``_direct_package_callees``; classes contribute their package base
    classes plus the callees of every method (base sources matter:
    ``inspect.getsource`` of a subclass does NOT include inherited
    method bodies)."""
    if isinstance(obj, types.FunctionType):
        return _direct_package_callees(obj)
    if isinstance(obj, type):
        out: dict[str, object] = {}
        for base in obj.__bases__:
            if getattr(base, "__module__", "").startswith(PKG):
                out[f"{base.__module__}.{base.__qualname__}"] = base
        for attr in vars(obj).values():
            # Unwrap BEFORE the type check (v5): partial(SomeClass) /
            # staticmethod(partial(...)) previously hit the plain-
            # function filter with the wrapper still on and were
            # silently skipped.
            attr = _unwrap_wrappers(attr)
            # TYPE-valued class attributes — nested classes and aliased
            # package classes (`Store = SegmentStore`) — join the
            # closure and descend through _callees_of on the BFS (v4).
            if isinstance(attr, type) and getattr(
                attr, "__module__", ""
            ).startswith(PKG):
                out[f"{attr.__module__}.{attr.__qualname__}"] = attr
                continue
            meth = _unwrap_method(attr)
            if meth is None:
                continue
            # The method ITSELF joins the closure too (review r11): a
            # function bound as a class attribute but DEFINED elsewhere
            # (`handler = helper_fn`) is invisible in the class's own
            # source, so without this its body rewires silently. For
            # body-defined methods it only re-hashes source the class
            # already covers — deterministic and harmless.
            if getattr(meth, "__module__", "").startswith(PKG):
                out[f"{meth.__module__}.{meth.__qualname__}"] = meth
            for c in _direct_package_callees(meth):
                out[f"{c.__module__}.{c.__qualname__}"] = c
        return [out[k] for k in sorted(out)]
    return []


def _transitive_package_callees(fn: types.FunctionType) -> list:
    """The full cycle-guarded closure of package callees under ``fn``
    (VERDICT r10 next #2): BFS over ``_callees_of`` with a visited set
    keyed by qualified name, result sorted for a deterministic hash
    input. Depth is bounded by the package's call graph (small); the
    visited set guards mutual recursion."""
    seen: dict[str, object] = {}
    frontier = list(_direct_package_callees(fn))
    while frontier:
        obj = frontier.pop()
        key = f"{obj.__module__}.{obj.__qualname__}"
        if key in seen:
            continue
        seen[key] = obj
        frontier.extend(_callees_of(obj))
    return [seen[k] for k in sorted(seen)]


def query_fingerprint(fn: types.FunctionType, oracle: str | None) -> str:
    """16-hex-char sha256 over (fn source, oracle SQL, transitive
    package callee-closure sources). Stable across processes and
    rounds as long as none of those sources change."""
    parts = [inspect.getsource(fn), oracle or ""]
    for helper in _transitive_package_callees(fn):
        try:
            parts.append(inspect.getsource(helper))
        except (OSError, TypeError):
            pass  # builtins / C-level callables carry no source
    digest = hashlib.sha256("\x00".join(parts).encode("utf-8")).hexdigest()
    return digest[:16]
