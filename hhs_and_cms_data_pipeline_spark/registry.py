"""Query/operator registry feeding ``__spark_entry__.py``.

Every operator ID from SURVEY.md §2 registers here as a QuerySpec:
a ``(spark, sf_dir) -> DataFrame`` builder plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string for the DuckDB differential check.
Column names are aliased identically on both sides (the driver sorts columns
by name before hashing values).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules whose import populates the registry.
_OPERATOR_MODULES = (
    "hhs_and_cms_data_pipeline_spark.operators.report",
    "hhs_and_cms_data_pipeline_spark.operators.relational",
    "hhs_and_cms_data_pipeline_spark.operators.ingest",
    "hhs_and_cms_data_pipeline_spark.operators.dedup",
    "hhs_and_cms_data_pipeline_spark.operators.similarity",
    "hhs_and_cms_data_pipeline_spark.operators.text",
    "hhs_and_cms_data_pipeline_spark.operators.retrieval",
    "hhs_and_cms_data_pipeline_spark.operators.multimodal",
    "hhs_and_cms_data_pipeline_spark.operators.streaming_batch",
    "hhs_and_cms_data_pipeline_spark.operators.sources_sinks",
    "hhs_and_cms_data_pipeline_spark.operators.relational_ext",
    "hhs_and_cms_data_pipeline_spark.operators.windows_scale",
    "hhs_and_cms_data_pipeline_spark.operators.ingest_queries",
    "hhs_and_cms_data_pipeline_spark.operators.curation",
    "hhs_and_cms_data_pipeline_spark.operators.tpch_full",
    "hhs_and_cms_data_pipeline_spark.operators.graph",
    "hhs_and_cms_data_pipeline_spark.operators.sketch",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB-runnable ANSI SQL; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query spec {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), bench, tags)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
