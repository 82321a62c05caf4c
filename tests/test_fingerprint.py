"""Fingerprint algorithm contract (VERDICT r10 next #2): the hash
must cover the TRANSITIVE callee closure, so a rewire two call levels
down (a helper's helper — the r9 incident class, one level deeper)
drifts the query's fingerprint and re-enters the driver window. v1
stopped at direct callees and was blind to exactly this."""

from __future__ import annotations

import importlib
import linecache
import sys
import textwrap

import pytest

from batch_processing_etl_orchestration_spark.plans import fingerprint as FP
from batch_processing_etl_orchestration_spark.plans import registry as R

PKG_SRC = {
    "__init__.py": "",
    "deep.py": """
        def leaf(x):
            return x + 1
    """,
    "mid.py": """
        from fpdemo_pkg.deep import leaf

        def helper(x):
            return leaf(x) * 2
    """,
    "deep2.py": """
        def leaf2(x):
            return x * 3
    """,
    "handlers.py": """
        def bound_handler(x):
            return x - 7

        def partial_target(x, y):
            return x * y

        def cached_target(x):
            return x + 11
    """,
    "aliased.py": """
        class AliasedStore:
            def get(self):
                return 5
    """,
    "ops.py": """
        import functools

        from fpdemo_pkg.aliased import AliasedStore
        from fpdemo_pkg.deep import leaf
        from fpdemo_pkg.handlers import bound_handler, cached_target, partial_target

        class Engine:
            handler = bound_handler  # defined OUTSIDE the class body
            Store = AliasedStore  # type-valued attribute (alias)
            scaled = functools.partial(partial_target, 2)
            # v5 shapes: nested wrappers and partial-over-class
            deep_scaled = staticmethod(functools.partial(partial_target, 3))
            StoreFactory = functools.partial(AliasedStore)

            def run(self, x):
                return leaf(x) - 1

            def run_inline(self, x):
                from fpdemo_pkg.deep2 import leaf2

                return leaf2(x)

            @functools.cached_property
            def cache_seed(self):
                return cached_target(0)
    """,
    "query.py": """
        from fpdemo_pkg.mid import helper
        from fpdemo_pkg.ops import Engine

        def q_demo(spark, sf_dir):
            return helper(1)

        def q_class_demo(spark, sf_dir):
            return Engine().run(1)
    """,
}


@pytest.fixture
def demo_pkg(tmp_path, monkeypatch):
    pkg = tmp_path / "fpdemo_pkg"
    pkg.mkdir()
    for fname, src in PKG_SRC.items():
        (pkg / fname).write_text(textwrap.dedent(src))
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(FP, "PKG", "fpdemo_pkg")
    yield pkg
    for mod in list(sys.modules):
        if mod.startswith("fpdemo_pkg"):
            del sys.modules[mod]
    linecache.clearcache()


def _fresh_import():
    for mod in list(sys.modules):
        if mod.startswith("fpdemo_pkg"):
            del sys.modules[mod]
    linecache.clearcache()
    importlib.invalidate_caches()
    return importlib.import_module("fpdemo_pkg.query")


def _rewire_leaf(pkg):
    (pkg / "deep.py").write_text(
        textwrap.dedent(
            """
            def leaf(x):
                return x + 2  # rewired two levels below the query
            """
        )
    )


def test_depth2_rewire_drifts_fingerprint(demo_pkg):
    """q_demo -> helper -> leaf: changing leaf (depth 2) must change
    q_demo's fingerprint even though q_demo's and helper's own sources
    are byte-identical before and after."""
    q = _fresh_import()
    assert any(
        o.__qualname__ == "leaf" for o in FP._transitive_package_callees(q.q_demo)
    ), "closure must reach the depth-2 helper"
    assert not any(
        o.__qualname__ == "leaf" for o in FP._direct_package_callees(q.q_demo)
    ), "precondition: leaf is NOT a direct callee (depth 2 only)"
    before = FP.query_fingerprint(q.q_demo, "SELECT 1")

    _rewire_leaf(demo_pkg)
    q2 = _fresh_import()
    after = FP.query_fingerprint(q2.q_demo, "SELECT 1")
    assert before != after


def test_depth2_rewire_through_class_method(demo_pkg):
    """q_class_demo -> Engine.run -> leaf: the closure must descend
    through class METHODS, not just inspect.getsource of the class."""
    q = _fresh_import()
    before = FP.query_fingerprint(q.q_class_demo, None)
    _rewire_leaf(demo_pkg)
    q2 = _fresh_import()
    after = FP.query_fingerprint(q2.q_class_demo, None)
    assert before != after


def test_cycle_guarded(demo_pkg):
    """Mutually recursive helpers must not hang the closure walk."""
    (demo_pkg / "mid.py").write_text(
        textwrap.dedent(
            """
            from fpdemo_pkg.deep import leaf

            def helper(x):
                return other(leaf(x))

            def other(x):
                return helper(x) if x < 0 else x
            """
        )
    )
    q = _fresh_import()
    names = {o.__qualname__ for o in FP._transitive_package_callees(q.q_demo)}
    assert {"helper", "other", "leaf"} <= names


def test_depth2_rewire_sorts_query_with_never_attested(
    demo_pkg, tmp_path, monkeypatch
):
    """End-to-end through the registry: a GREEN query whose depth-2
    helper was rewired after its attestation must sort with the
    never-attested queries, ahead of the fingerprint-stable tail."""
    import json

    q = _fresh_import()
    spec = R.QuerySpec(name="q_fp_demo", fn=q.q_demo, oracle="SELECT 1")
    monkeypatch.setitem(R.QUERIES, "q_fp_demo", spec)
    green = {"err": None, "rows_match": True, "schema_match": True,
             "hash_match": True}
    stable = next(iter(R.QUERIES))  # a real query, fp recorded at HEAD
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_fp_demo": green, stable: green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({stable: green})
    )
    monkeypatch.setattr(R, "_repo_root", lambda: str(tmp_path))
    rec = {
        "q_fp_demo": {"round": 1, "fp": R.current_fingerprint("q_fp_demo")},
        stable: {"round": 2, "fp": R.current_fingerprint(stable)},
    }
    monkeypatch.setattr(R, "_recorded_fingerprints", lambda: rec)
    ordered = R.ordered_names()
    # pre-rewire: fingerprint-stable, so it sits in the green tail
    # STALEST first — i.e. ahead of `stable` (round 1 < round 2) but
    # still in the tail section, not the pending head
    assert ordered.index("q_fp_demo") < ordered.index(stable)

    _rewire_leaf(demo_pkg)
    q2 = _fresh_import()
    monkeypatch.setitem(
        R.QUERIES, "q_fp_demo",
        R.QuerySpec(name="q_fp_demo", fn=q2.q_demo, oracle="SELECT 1"),
    )
    ordered = R.ordered_names()
    # post-rewire: drifted-green sorts with the pending (never-attested)
    # section, ahead of EVERY fingerprint-stable green — despite being
    # attested more recently than nothing and green at its last row
    assert ordered.index("q_fp_demo") < ordered.index(stable)
    rows = R._latest_rows()
    stable_greens = [
        n for n in ordered
        if n != "q_fp_demo" and n in rows and rows[n][1]
    ]
    assert all(
        ordered.index("q_fp_demo") < ordered.index(n) for n in stable_greens
    )


def test_method_inline_import_joins_closure(demo_pkg):
    """Review r11 fix 1: a method's source is indented, so ast.parse
    needed textwrap.dedent — without it the inline
    `from <pkg> import x` idiom inside class methods (e.g.
    snapshots.py's zorder_by) silently vanished from the closure."""
    q = _fresh_import()
    names = {
        o.__qualname__
        for o in FP._transitive_package_callees(q.q_class_demo)
    }
    assert "leaf2" in names
    before = FP.query_fingerprint(q.q_class_demo, None)
    (demo_pkg / "deep2.py").write_text(
        "def leaf2(x):\n    return x * 4  # rewired\n"
    )
    q2 = _fresh_import()
    assert FP.query_fingerprint(q2.q_class_demo, None) != before


def test_class_attribute_bound_function_joins_closure(demo_pkg):
    """Review r11 fix 2: `handler = helper_fn` binds a function defined
    elsewhere — the class source shows only the assignment, so the
    function itself must join the closure or its body rewires
    silently."""
    q = _fresh_import()
    names = {
        o.__qualname__
        for o in FP._transitive_package_callees(q.q_class_demo)
    }
    assert "bound_handler" in names
    before = FP.query_fingerprint(q.q_class_demo, None)
    (demo_pkg / "handlers.py").write_text(
        "def bound_handler(x):\n    return x - 8  # rewired\n\n"
        "def partial_target(x, y):\n    return x * y\n\n"
        "def cached_target(x):\n    return x + 11\n"
    )
    q2 = _fresh_import()
    assert FP.query_fingerprint(q2.q_class_demo, None) != before


def test_type_partial_and_cached_property_attrs_join_closure(demo_pkg):
    """ADVICE r11 #4 (v4): type-valued class attributes (aliased or
    nested classes), functools.partial objects, and cached_property
    wrappers were silently skipped by the plain-function filter —
    each must join the closure and drift the fingerprint when its
    target rewires."""
    q = _fresh_import()
    names = {
        o.__qualname__
        for o in FP._transitive_package_callees(q.q_class_demo)
    }
    assert {"AliasedStore", "partial_target", "cached_target"} <= names

    before = FP.query_fingerprint(q.q_class_demo, None)
    (demo_pkg / "aliased.py").write_text(
        "class AliasedStore:\n    def get(self):\n        return 6\n"
    )
    q2 = _fresh_import()
    after_alias = FP.query_fingerprint(q2.q_class_demo, None)
    assert after_alias != before

    (demo_pkg / "handlers.py").write_text(
        "def bound_handler(x):\n    return x - 7\n\n"
        "def partial_target(x, y):\n    return x * y + 1\n\n"
        "def cached_target(x):\n    return x + 11\n"
    )
    q3 = _fresh_import()
    assert FP.query_fingerprint(q3.q_class_demo, None) != after_alias


def test_nested_wrappers_and_partial_over_class_join_closure(demo_pkg):
    """Review r12 (v5): staticmethod-wrapped partials and
    functools.partial over a package CLASS were still skipped by v4's
    single-level elif unwrap — both must join the closure (the class
    via type-descent after unwrapping, the partial's innermost func
    directly), so rewiring either target drifts the fingerprint. The
    targets here are already in the closure via other routes, so the
    real assertion is on the unwrap helper itself plus end-to-end
    drift."""
    import functools

    q = _fresh_import()
    import fpdemo_pkg.ops as ops

    # the unwrap helper reaches through nested wrappers
    assert FP._unwrap_wrappers(
        ops.Engine.__dict__["deep_scaled"]
    ).__name__ == "partial_target"
    assert FP._unwrap_wrappers(
        ops.Engine.__dict__["StoreFactory"]
    ).__qualname__ == "AliasedStore"

    # and _callees_of sees them as closure members on the class itself
    names = {getattr(o, "__qualname__", "") for o in FP._callees_of(ops.Engine)}
    assert "partial_target" in names
    assert "AliasedStore" in names
