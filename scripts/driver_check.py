#!/usr/bin/env python
"""Replicate the driver's correctness gate locally.

Usage:
    PYTHONPATH=. python scripts/driver_check.py [name ...]

Runs `__spark_entry__.entry()` as a smoke, then for each requested query
name (default: a fixed 8-name spot sample) executes the Spark builder AND
its DuckDB oracle at sf0.01 and compares bit-exactly — the same contract
as tests/test_oracle_diff.py, packaged for quick ad-hoc checks of freshly
touched queries without a pytest session.

Comparison notes learned the hard way (mirrors tests/oracle_utils.py):
- floats compare EXACTLY (check_exact) — the engine routes double
  aggregates through decimal precisely so this holds;
- date columns normalize to ISO strings first (Spark hands back
  datetime.date objects, DuckDB datetime64 — same values, different
  dtypes);
- columns sort by name before compare, like the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SAMPLE = [
    "flagship_utilization",
    "tpch_q1_pricing_summary",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "text_bm25_topk",
    "sim_radius_search",
    "curation_hashed_linear_score",
    "u4_debounce_dedup",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:] or DEFAULT_SAMPLE

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    n = len(entrymod.entry(spark).collect())
    print(f"entry(): {n} rows")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failed.append(name)
            continue
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        cols = sorted(sdf.columns)
        try:
            assert sorted(odf.columns) == cols, (
                list(sdf.columns), list(odf.columns))
            a = sdf[cols].reset_index(drop=True)
            b = odf[cols].reset_index(drop=True)
            for c in cols:  # date/datetime dtype mismatch is cosmetic
                if "date" in str(a[c].dtype) or "date" in str(b[c].dtype) or (
                    len(a) and type(a[c].iloc[0]).__name__ == "date"
                ):
                    a[c] = a[c].astype(str).str[:10]
                    b[c] = b[c].astype(str).str[:10]
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=True
            )
            print(f"{name}: OK ({len(a)} rows)")
        except AssertionError as e:
            print(f"{name}: MISMATCH — {str(e)[:200]}")
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
