"""Import/parse guard: every module in the package must compile and import.

Round-10 postmortem (VERDICT r10 §wrong): a single mid-refactor edit left
``operators/relational_ext.py`` syntactically invalid, and because the
registry imports every operator module eagerly, the WHOLE 275-query
surface (driver correctness gate, bench, pytest collection) went dark.
This test makes that class of breakage impossible to miss in any pytest
invocation — it runs in well under a second and needs no SparkSession.
"""

import compileall
import importlib
import pkgutil
from pathlib import Path

import hhs_and_cms_data_pipeline_spark as pkg

PKG_ROOT = Path(pkg.__file__).parent


def _walk_module_names():
    names = [pkg.__name__]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        names.append(info.name)
    return names


def test_every_module_compiles():
    # compileall returns True only if every file byte-compiled cleanly.
    assert compileall.compile_dir(str(PKG_ROOT), quiet=2, force=True), (
        "at least one module in the package failed to byte-compile — "
        "run `python -m compileall hhs_and_cms_data_pipeline_spark` for details"
    )


def test_every_module_imports():
    failures = {}
    for name in _walk_module_names():
        try:
            importlib.import_module(name)
        except Exception as exc:  # noqa: BLE001 — report every breakage
            failures[name] = repr(exc)
    assert not failures, f"modules failed to import: {failures}"


def test_registry_serves_full_surface():
    from hhs_and_cms_data_pipeline_spark.registry import all_specs

    specs = all_specs()
    assert len(specs) >= 275, (
        f"registry shrank to {len(specs)} queries — an operator module "
        "probably failed to import or a rename dropped registrations"
    )


def test_broken_module_degrades_to_partial_surface(monkeypatch, capsys):
    """One broken operator module must NOT take down the whole registry
    (round-10 failure mode): the healthy modules' queries stay servable
    and the breakage is recorded loudly in registry.IMPORT_ERRORS."""
    from hhs_and_cms_data_pipeline_spark import registry

    healthy = len(registry.all_specs())
    monkeypatch.setattr(
        registry,
        "_OPERATOR_MODULES",
        registry._OPERATOR_MODULES
        + ("hhs_and_cms_data_pipeline_spark.operators.__does_not_exist__",),
    )
    specs = registry.all_specs()
    assert len(specs) == healthy, "healthy modules' queries must survive"
    assert list(registry.IMPORT_ERRORS) == [
        "hhs_and_cms_data_pipeline_spark.operators.__does_not_exist__"
    ]
    assert "FAILED TO IMPORT" in capsys.readouterr().err
    # A clean pass must clear the stale error record.
    monkeypatch.undo()
    registry.all_specs()
    assert registry.IMPORT_ERRORS == {}


def test_half_imported_module_queries_are_pruned(monkeypatch, capsys):
    """Decorators run top-to-bottom, so a module that dies mid-import has
    already registered its early queries against half-initialized module
    state. all_specs() must prune those, not serve them (ADVICE r11)."""
    from hhs_and_cms_data_pipeline_spark import registry

    broken = "hhs_and_cms_data_pipeline_spark.operators.__half_broken__"

    def orphan_builder(spark, sf_dir):  # pragma: no cover — never served
        raise RuntimeError("must have been pruned")

    orphan_builder.__module__ = broken
    healthy = dict(registry.all_specs())
    monkeypatch.setattr(
        registry,
        "_OPERATOR_MODULES",
        registry._OPERATOR_MODULES + (broken,),
    )
    monkeypatch.setitem(
        registry._REGISTRY,
        "__orphan_query__",
        registry.QuerySpec("__orphan_query__", orphan_builder, None),
    )
    specs = registry.all_specs()
    assert "__orphan_query__" not in specs, (
        "a half-imported module's early registrations must be pruned"
    )
    assert set(specs) == set(healthy)
    err = capsys.readouterr().err
    assert "pruned 1 half-imported queries" in err
    monkeypatch.undo()
    registry.all_specs()
    assert registry.IMPORT_ERRORS == {}


def test_entry_module_exposes_driver_contract():
    import __spark_entry__ as entry_mod

    assert callable(entry_mod.entry)
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 275
    assert set(o) <= set(q), "oracle_sql() keys must be a subset of queries()"
