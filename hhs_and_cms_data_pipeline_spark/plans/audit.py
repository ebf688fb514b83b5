"""Physical-plan audit helpers (SURVEY §4).

The scale posture of every operator is asserted in tests/test_plans.py with
these helpers: filters must reach the Parquet scan (PushedFilters), scans
must be column-pruned (ReadSchema), small dims must broadcast, and map-only
stages must show zero Exchange. A plan regression that silently adds a
shuffle or widens a scan fails CI — the 100 TB design is enforced, not
aspirational.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of the DataFrame's physical plan."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(plan: str) -> list[str]:
    """All PushedFilters lists found in the plan (one per scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    """All ReadSchema structs found in the plan (one per scan)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges)."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def count_data_shuffles(plan: str) -> int:
    """Exchanges that move data BY KEY (hash/range) — excludes the deliberate
    round-robin rebalance `sources.spread` adds for single-file inputs."""
    return count_exchanges(plan) - len(re.findall(r"RoundRobinPartitioning", plan))


def count_broadcast_joins(plan: str) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def scan_columns(plan: str, *, containing: str) -> set[str]:
    """Column names of the first ReadSchema containing the given column."""
    for schema in read_schemas(plan):
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        if containing in cols:
            return cols
    raise AssertionError(
        f"no scan with column {containing!r}; schemas: {read_schemas(plan)}"
    )
