"""Write sinks (SURVEY §2.1 K1/K2/K3).

The reference's sink is psycopg executemany in 1000-row batches inside one
transaction (load-hhs.py:28-33, load-quality.py:25,66-88). Spark equivalents:

  K1 batched insert  -> per-partition parallel Parquet writes (native)
  K2 transactionality-> write to a temp dir + atomic rename (job-level
                        all-or-nothing; Delta would give true ACID, not
                        available in this container)
  K3 idempotent load -> anti-join against existing keys before append

Scale notes: fact tables partition by their date column at write so readers
get partition pruning for every `WHERE collection_week <= X`; the anti-join
reads existing keys column-pruned and (for incremental loads) should be
partition-pruned to the incoming date range.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from .operators.ingest import upsert_new_keys


def write_parquet_atomic(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """K2: all-or-nothing publish. The job writes to a sibling temp dir; only
    a fully-successful write is renamed into place (readers never observe a
    partial table). On failure the temp dir is removed and the previous table
    state is untouched — the moral equivalent of rollback (load-hhs.py:31-34).
    """
    tmp = f"{path}.__tmp__{uuid.uuid4().hex}"
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def append_new_keys(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """K1+K3: idempotent append — loading the same batch twice is a no-op
    (ON CONFLICT DO NOTHING semantics, helper_load_hhs.py:96,163).

    Returns the number of rows actually appended.
    """
    existing = spark.read.parquet(path) if os.path.exists(path) else None
    to_insert = upsert_new_keys(incoming, existing, keys).cache()
    try:
        n = to_insert.count()
        if n:
            writer = to_insert.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        return n
    finally:
        to_insert.unpersist()
