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
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from .operators.ingest import upsert_new_keys


def write_parquet_atomic(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    gc_grace_seconds: float = 60.0,
) -> None:
    """K2: all-or-nothing publish via symlink swap. The job writes a fully
    new versioned data dir; `path` is a symlink atomically renamed onto the
    new version (POSIX rename replaces the link in one step), so a reader
    resolving `path` sees either the complete old table or the complete new
    one — never a partial or missing table. On failure the half-written
    version is removed and the published link is untouched — the moral
    equivalent of rollback (load-hhs.py:31-34).

    Concurrent writers race safely: each writes its own version dir and the
    last rename wins whole. Old versions are garbage-collected only after
    `gc_grace_seconds` (the retention window — VACUUM semantics): the grace
    both protects other writers' in-progress version dirs and gives
    snapshot readers (read_published) time to finish their scan. True
    multi-writer ACID with snapshot history needs a table format (Delta /
    Iceberg — unavailable in this container); this is the minimal commit
    protocol that gives single-table atomic publish on a plain filesystem.
    """
    # Normalize to absolute against PYTHON's cwd before anything touches the
    # path: a relative `path` would otherwise (a) make the symlink target
    # resolve against the link's parent dir (out/tbl -> out/out/tbl.__v__x)
    # and (b) be resolved by Spark's JVM against ITS working directory,
    # which is pinned at session start and can disagree with os.getcwd().
    path = os.path.abspath(path)
    data_dir = f"{path}.__v__{uuid.uuid4().hex}"
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        _publish_version(path, data_dir, gc_grace_seconds)
    except Exception:
        shutil.rmtree(data_dir, ignore_errors=True)
        raise


def _publish_version(path: str, data_dir: str, gc_grace_seconds: float) -> None:
    """Swap the published symlink onto a fully-written version dir, then GC
    dethroned versions past the retention grace. `path` must already be
    absolute. Shared by write_parquet_atomic (full-table publish) and
    merge_rewrite_partitions (partial rewrite publish)."""
    import time

    if os.path.lexists(path) and not os.path.islink(path):
        # migration from the pre-symlink layout: one-time, non-atomic
        shutil.rmtree(path)
    prev = os.path.realpath(path) if os.path.islink(path) else None
    tmp_link = f"{path}.__link__{uuid.uuid4().hex}"
    os.symlink(data_dir, tmp_link)  # absolute target (path normalized above)
    os.rename(tmp_link, path)  # atomic publish
    if prev:
        # restart the dethroned version's GC clock NOW: grace must be
        # measured from REPLACEMENT, not from write completion — a
        # version that was current for hours would otherwise be
        # deleted seconds after being replaced (its mtime already far
        # exceeds the grace), yanking the dir out from under a reader
        # that pinned it moments before the publish.
        try:
            os.utime(prev, None)
        except OSError:
            pass
    # GC: drop versions that are not current/previous AND older than the
    # retention grace, where "age" counts from the dir's dethroning (see
    # the os.utime above), not its write time. Versions whose partitions
    # were REUSED by a newer version are safe to drop: reuse is by
    # per-file HARDLINK (merge_rewrite_partitions), so the shared inodes
    # survive the old dir's rmtree.
    base = os.path.basename(path)
    parent = os.path.dirname(path) or "."
    keep = {os.path.realpath(p) for p in (data_dir, prev) if p}
    now = time.time()
    for name in os.listdir(parent):
        cand = os.path.join(parent, name)
        stale = name.startswith((f"{base}.__v__", f"{base}.__link__"))
        if not stale or os.path.realpath(cand) in keep:
            continue
        try:
            if now - os.lstat(cand).st_mtime <= gc_grace_seconds:
                continue
            if os.path.islink(cand):
                os.unlink(cand)
            else:
                shutil.rmtree(cand, ignore_errors=True)
        except OSError:
            pass  # another writer's GC got there first


def merge_rewrite_partitions(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    gc_grace_seconds: float = 60.0,
) -> list[str]:
    """MERGE-style upsert (update-or-insert by `keys`) into a published
    partitioned table, rewriting ONLY the partitions the update batch
    touches — the strongest plain-Parquet approximation of transactional
    MERGE at scale (reference: ON CONFLICT upserts, helper_load_hhs.py:96).

    Protocol: a new version dir is assembled next to the current one —
    untouched partitions are carried over by per-file HARDLINK (zero data
    copy; hardlinked inodes survive GC of the donor version dir, unlike
    symlinks, so a later rmtree of the old version cannot dangle the new
    one), touched partitions are read-modify-written (anti-join the old
    partition on `keys`, union the batch rows) — then the published
    symlink swaps atomically via the same commit protocol as
    write_parquet_atomic. Readers see the complete old or complete new
    table, never a mix.

    At 100 TB the cost is proportional to the TOUCHED partitions plus one
    dim-sized driver fetch (the batch's distinct partition values), not to
    the table: a daily-partitioned fact with a one-day update batch
    rewrites one partition out of thousands.

    Returns the rewritten partition values (as strings, sorted).
    """
    from pyspark.sql import functions as F

    path = os.path.abspath(path)
    if not os.path.islink(path):
        raise ValueError(
            "merge target must be a write_parquet_atomic-published table "
            f"(symlink): {path}"
        )
    prev = os.path.realpath(path)
    # Dim-sized by contract: one row per touched partition.
    vals = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # Dir names are built as raw f"{col}={v}" below. Spark escapes special
    # characters in partition paths (Hive-style %XX) and writes NULL as
    # __HIVE_DEFAULT_PARTITION__; a value this code names differently than
    # Spark would silently MISS the touched-partition match — the old dir
    # would be hardlink-carried over unchanged while the batch also lands
    # in a new dir: duplicate keys in a published MERGE. Refuse loudly
    # instead of corrupting (dates/ints/plain identifiers are the
    # supported — and typical — partition domain).
    for v in vals:
        if v is None or not re.fullmatch(r"[A-Za-z0-9._-]+", str(v)):
            raise ValueError(
                f"unsupported partition value {v!r} for {partition_col}: "
                "merge_rewrite_partitions only supports non-null values "
                "matching [A-Za-z0-9._-]+ (Spark's path escaping would "
                "name the partition dir differently and the rewrite "
                "would silently duplicate rows)"
            )
    touched = {f"{partition_col}={v}" for v in vals}
    data_dir = f"{path}.__v__{uuid.uuid4().hex}"
    os.makedirs(data_dir)
    try:
        for name in os.listdir(prev):
            src = os.path.join(prev, name)
            dst = os.path.join(data_dir, name)
            if name.startswith(f"{partition_col}=") and name not in touched:
                os.makedirs(dst)
                for f_ in os.listdir(src):
                    os.link(os.path.join(src, f_), os.path.join(dst, f_))
            elif name == "_SUCCESS":
                open(dst, "w").close()
        for v in sorted(vals, key=str):
            pname = f"{partition_col}={v}"
            batch_v = updates.filter(
                F.col(partition_col) == F.lit(v)
            ).drop(partition_col)
            prev_part = os.path.join(prev, pname)
            if os.path.isdir(prev_part):
                old = spark.read.parquet(prev_part)
                # anti-join on THIS partition's batch keys: a key updated in
                # another partition must not delete rows here (only touched
                # partitions are rewritten, so cross-partition key moves are
                # out of contract anyway)
                merged = old.join(
                    batch_v.select(*keys).distinct(), keys, "left_anti"
                ).unionByName(batch_v)
            else:  # insert-only partition: nothing to rewrite, just write
                merged = batch_v
            merged.write.mode("overwrite").parquet(os.path.join(data_dir, pname))
        _publish_version(path, data_dir, gc_grace_seconds)
    except Exception:
        shutil.rmtree(data_dir, ignore_errors=True)
        raise
    return sorted(str(v) for v in vals)


def read_published_version(
    spark: SparkSession, path: str, steps_back: int = 1
) -> DataFrame:
    """K6: time-travel read — scan the snapshot `steps_back` publishes ago.

    Version history is reconstructed from the retained `.__v__` dirs:
    `steps_back=0` is the current target; older versions order by mtime
    DESCENDING, which is dethroning order — `_publish_version` os.utime's
    a version at the moment it is replaced, precisely so that both GC
    grace and this history read count from dethroning, not write time.
    Retention is bounded (GC keeps current + previous past the grace), so
    honest callers use steps_back<=1; deeper asks raise rather than
    silently returning the wrong snapshot. A table format (Delta/Iceberg)
    generalizes this to arbitrary-depth history with the same contract:
    every version is an immutable dir, the log orders them.
    """
    path = os.path.abspath(path)
    if steps_back < 0:
        raise ValueError(f"steps_back must be >= 0, got {steps_back}")
    if steps_back == 0:
        return read_published(spark, path)
    current = os.path.realpath(path)
    base, parent = os.path.basename(path), os.path.dirname(path) or "."
    old = [
        os.path.join(parent, n)
        for n in os.listdir(parent)
        if n.startswith(f"{base}.__v__")
        and os.path.realpath(os.path.join(parent, n)) != current
    ]
    old.sort(key=lambda p: os.lstat(p).st_mtime, reverse=True)
    if steps_back > len(old):
        raise ValueError(
            f"time travel {steps_back} steps requested but only "
            f"{len(old)} dethroned versions of {path!r} are retained"
        )
    return spark.read.parquet(old[steps_back - 1])


def read_published(spark: SparkSession, path: str) -> DataFrame:
    """Snapshot read of a write_parquet_atomic table: resolve the published
    symlink ONCE and scan the pinned version dir. Reading through the link
    itself would re-resolve per file — a concurrent publish mid-scan would
    mix two versions. The pinned dir survives at least `gc_grace_seconds`
    after being replaced."""
    return spark.read.parquet(os.path.realpath(path))


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


def clear_published_versions(path: str) -> None:
    """Deterministic-rerun reset for a write_parquet_atomic target: drop
    retained version dirs, crashed-publish link temps, and the live
    symlink. rmtree refuses symlinks (the .__link__ temps are links) —
    unlink those, rmtree real dirs. A bare shutil.rmtree(path) is a silent
    no-op on the published SYMLINK, which is why callers must use this."""
    import glob as _glob
    import shutil as _shutil

    for stale in _glob.glob(f"{path}.__v__*") + _glob.glob(f"{path}.__link__*"):
        if os.path.islink(stale):
            os.unlink(stale)
        else:
            _shutil.rmtree(stale, ignore_errors=True)
    if os.path.islink(path):
        os.unlink(path)
