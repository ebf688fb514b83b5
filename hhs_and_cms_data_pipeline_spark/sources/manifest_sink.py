"""K10 — a manifest-committed JSONL SINK as a Spark 4 Python Data Source
writer: the WRITE half of the custom-data-source story (S10/S11 cover the
read half).

The protocol is the classic two-phase job commit, stated through
`DataSourceWriter`:

- ``write(iterator)`` runs once per task and writes that partition's rows
  to a UNIQUELY-NAMED part file (uuid — task retries and speculative
  duplicates can never collide or overwrite), then returns a commit
  message carrying (file name, row count, exact-decimal value sum).
- ``commit(messages)`` runs on the driver only if every task succeeded:
  it writes the MANIFEST (the list of committed part files + audit
  totals) via temp-file + atomic rename. A part file is VISIBLE iff the
  manifest names it — readers list the manifest, never the directory, so
  orphans from failed/retried tasks are invisible by construction. This
  is exactly the visibility rule of the repo's parquet atomic-publish
  sink (K2) and of Iceberg/Delta snapshot commits, restated through the
  Python DS writer API.
- ``abort(messages)`` removes any part files the failed job managed to
  write, leaving a previously-committed manifest untouched.

The registered query (operators/sources_sinks.py k10) pushes an
aggregation through this sink, reads back ONLY manifest-listed files, and
the DuckDB oracle recomputes the aggregation from the raw table — so the
differential gate proves the full write -> commit -> manifest-scoped read
trip is lossless and exactly-once.

Scale notes: one manifest write per job (driver-side, O(#tasks) entries)
is the same commit-coordination cost every table format pays; part files
are written executor-side in parallel. JSONL is the interchange format
here because the container ships no extra codecs — the protocol is
format-agnostic.

Concurrency + retention (r9):
- commits SERIALIZE on a lock file (`_commit_lock`) — concurrent append
  jobs or streaming batches can no longer lose each other's parts to the
  read-modify-write race on MANIFEST.json;
- superseded parts are TOMBSTONED in the manifest and physically deleted
  only `gc_grace_seconds` (sink option, default 60) after dethroning, so
  a reader that pinned the prior manifest can finish its scan — the same
  VACUUM retention contract as sinks.py's write_parquet_atomic.
"""

from __future__ import annotations

import json
import os
import time
import uuid
import warnings
from collections.abc import Iterator
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST_NAME = "MANIFEST.json"


def _load_manifest(path: str) -> dict | None:
    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def _all_part_files(manifest: dict) -> list[str]:
    names = [p["file"] for p in manifest.get("parts", [])]
    for b in manifest.get("batches", []):
        names.extend(p["file"] for p in b["parts"])
    return names


def _atomic_write_manifest(path: str, manifest: dict) -> None:
    tmp = os.path.join(path, f".{MANIFEST_NAME}.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.rename(tmp, os.path.join(path, MANIFEST_NAME))


LOCK_NAME = "_COMMIT.lock"


class _commit_lock:
    """Mutual exclusion for the manifest's read-modify-write commit.

    Append-mode batch commits and streaming commits both load the prior
    manifest, merge, and rename a new one into place; two concurrent jobs
    doing that unguarded would each read the same prior manifest and the
    last rename would silently drop the other job's parts (ADVICE r8).
    An O_CREAT|O_EXCL lock file serializes the critical section — the
    same driver-side, O(1)-per-job coordination cost a table-format
    commit log pays. A lock older than `stale_after` is presumed
    abandoned by a crashed driver and broken (the holder is a driver-side
    commit that runs in milliseconds, not minutes)."""

    def __init__(
        self, path: str, timeout: float = 30.0, stale_after: float = 300.0
    ) -> None:
        self._lock = os.path.join(path, LOCK_NAME)
        self._timeout = timeout
        self._stale_after = stale_after

    def __enter__(self) -> None:
        deadline = time.monotonic() + self._timeout
        while True:
            try:
                fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, json.dumps({"pid": os.getpid()}).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    if time.time() - os.stat(self._lock).st_mtime > self._stale_after:
                        os.unlink(self._lock)  # break a crashed holder's lock
                        continue
                except FileNotFoundError:
                    continue  # holder released between open and stat
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"manifest commit lock {self._lock} held for >"
                        f"{self._timeout}s — concurrent committer stuck?"
                    ) from None
                time.sleep(0.05)

    def __exit__(self, *exc) -> None:
        try:
            os.unlink(self._lock)
        except FileNotFoundError:
            pass


def _gc_tombstones(
    manifest: dict | None, superseded: list[str], grace: float
) -> tuple[list[dict], list[str]]:
    """Retention bookkeeping for superseded part files: newly-dethroned
    files become TOMBSTONES carried in the manifest (still on disk, no
    longer visible), and tombstones older than `grace` seconds graduate
    to physical deletion. A reader that pinned the prior manifest can
    therefore finish opening its files for at least `grace` seconds
    after an overwrite — the same VACUUM-style retention contract as
    sinks.py's write_parquet_atomic. The grace is a PER-TARGET policy
    supplied by each writer (a later commit with a shorter grace reaps
    earlier writers' tombstones early — configure it consistently per
    target, as with any table-format retention setting). Returns
    (tombstones to carry in the new manifest, file names to delete now)."""
    now = time.time()
    gc = list((manifest or {}).get("gc", []))
    gc.extend({"file": f, "superseded_at": now} for f in superseded)
    keep = [t for t in gc if now - t["superseded_at"] < grace]
    expired = [t["file"] for t in gc if now - t["superseded_at"] >= grace]
    return keep, expired


def _checkpoint_query_id(options: dict) -> str | None:
    """Stable identity of the STREAMING QUERY behind a checkpoint: Spark
    writes ``<checkpoint>/metadata`` ({"id": uuid}) when a query first
    starts, and the id survives restarts of the same checkpoint but is
    fresh for a new one — exactly the key that distinguishes "replayed
    batch 0 of MY run" (skip: already committed) from "batch 0 of a NEW
    query reusing the target directory" (commit: different data)."""
    cp = options.get("checkpointlocation") or options.get("checkpointLocation")
    if not cp:
        return None
    for prefix in ("file://", "file:"):
        if cp.startswith(prefix):
            cp = cp[len(prefix):]
            break
    try:
        with open(os.path.join(cp, "metadata")) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


@dataclass
class PartCommit(WriterCommitMessage):
    filename: str
    n_rows: int
    value_sum: str  # exact decimal, serialized


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_jsonl sink requires option 'path'")
        self._path = path
        # which numeric column (if any) the per-part audit total sums —
        # a sink OPTION, not a hardcoded query-specific name
        self._audit_col = options.get("audit_column")
        # SaveMode, as Spark hands it to DataSource.writer(): True for
        # .mode("overwrite"), False for append. Append MERGES the prior
        # manifest's parts (they stay visible); overwrite replaces the
        # manifest and TOMBSTONES the superseded part files, which are
        # physically deleted only once their tombstone outlives the
        # retention grace (see _gc_tombstones).
        self._overwrite = overwrite
        self._grace = float(options.get("gc_grace_seconds", 60.0))

    def write(self, iterator: Iterator) -> PartCommit:
        # r13 negative result (guide §4, measured and reverted): switching
        # this writer to DataSourceArrowWriter/DataSourceStreamArrowWriter
        # (RecordBatch iterator + to_pylist instead of pickled Rows) was
        # value-identical but NOT faster — interleaved worktree A/B at
        # sf0.1: stream_manifest_sink 4.01/5.11s row vs 4.29/5.47s arrow,
        # k10 roundtrip a wash. The per-row cost here is json.dumps plus
        # the Decimal audit fold, which to_pylist() merely restates as
        # dict materialization; the boundary serialization it removes is
        # second-order at this row width. Revisit only if the sink ever
        # carries wide binary payloads, where Arrow's buffer transfer
        # actually wins.
        os.makedirs(self._path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        vsum = Decimal(0)
        # write-then-return: the file only becomes VISIBLE if commit()
        # later manifests it, so a torn write from a dying task is inert
        with open(os.path.join(self._path, name), "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps(d, sort_keys=True) + "\n")
                n += 1
                if self._audit_col and d.get(self._audit_col) is not None:
                    vsum += Decimal(str(d[self._audit_col]))
        return PartCommit(filename=name, n_rows=n, value_sum=str(vsum))

    def commit(self, messages) -> None:
        # a zero-partition job commits without any write() having run —
        # the directory must still exist for the (empty) manifest
        os.makedirs(self._path, exist_ok=True)
        # append merges the PRIOR manifest — an unguarded read-modify-
        # write would let two concurrent jobs each load the same prior
        # and the last rename silently drop the other's parts (ADVICE r8)
        with _commit_lock(self._path):
            prior = _load_manifest(self._path)
            new_parts = [
                {"file": m.filename, "n_rows": m.n_rows, "value_sum": m.value_sum}
                for m in messages
                if m is not None
            ]
            if self._overwrite:
                # everything the prior manifest named (batch parts AND any
                # streaming batches) is superseded. Retention contract: the
                # files stay on disk as manifest TOMBSTONES for
                # `gc_grace_seconds` after the atomic rename, so a reader
                # that pinned the old manifest can still open every file it
                # names within the grace window; expired tombstones are
                # reclaimed on later commits (VACUUM semantics, mirroring
                # sinks.py write_parquet_atomic).
                superseded = _all_part_files(prior) if prior else []
                parts = new_parts
            else:
                # append: prior committed parts stay visible alongside this
                # job's (streaming `batches` entries, if any, are preserved
                # verbatim — manifest_files() reads both shapes)
                superseded = []
                parts = (prior.get("parts", []) if prior else []) + new_parts
            manifest = dict(prior or {})
            manifest["format"] = "jsonl"
            manifest["parts"] = sorted(parts, key=lambda p: p["file"])
            manifest["n_rows"] = sum(p["n_rows"] for p in parts)
            if self._overwrite:
                manifest.pop("batches", None)
            tombstones, expired = _gc_tombstones(prior, superseded, self._grace)
            if tombstones:
                manifest["gc"] = tombstones
            else:
                manifest.pop("gc", None)
            _atomic_write_manifest(self._path, manifest)
            for name in expired:
                try:
                    os.remove(os.path.join(self._path, name))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.filename))
            except FileNotFoundError:
                pass


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: one manifest BATCH ENTRY per micro-batch.

    ``commit(messages, batchId)`` appends {batch_id, parts} to the
    manifest via read-modify-write + atomic rename, and is IDEMPOTENT on
    (query identity, batch_id): after a driver restart Spark may
    re-commit the last batch, and re-registering its parts would
    double-count every row — the seen check makes the replayed commit a
    no-op, which together with uuid-named parts gives exactly-once
    visibility end to end. The query identity (the checkpoint's stable
    query id) is stored in the manifest so a FRESH checkpoint writing to
    an existing target does not alias the stale manifest's batch ids:
    its batches reset instead of its batch 0 being silently dropped."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_jsonl sink requires option 'path'")
        self._path = path
        self._options = dict(options)
        self._inner = ManifestJsonlWriter(options)

    def write(self, iterator: Iterator) -> PartCommit:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self._path, exist_ok=True)  # empty micro-batch: no write() ran
        with _commit_lock(self._path):
            self._commit_locked(messages, batchId)

    def _commit_locked(self, messages, batchId: int) -> None:
        prior = _load_manifest(self._path)
        manifest = prior or {"format": "jsonl", "batches": []}
        # resolved at commit time, not __init__: <checkpoint>/metadata is
        # guaranteed to exist once batches are committing
        qid = _checkpoint_query_id(self._options)
        if qid is None and manifest.get("query_id") is not None:
            # the target was written by an identity-carrying query but THIS
            # query's identity is unresolvable (checkpointLocation not
            # passed as a sink option — e.g. the session-conf default or a
            # temp checkpoint). batchId-only dedup would silently drop a
            # fresh checkpoint's batch 0 against the stale manifest — the
            # exact data-loss the query-id keying exists to prevent
            # (ADVICE r8). Warn loudly; pass checkpointLocation to the sink.
            warnings.warn(
                "manifest_jsonl: cannot resolve this query's checkpoint id "
                "(no checkpointLocation SINK OPTION) but the target manifest "
                f"records query_id={manifest['query_id']!r}; falling back to "
                "batchId-only dedup, which DROPS batch ids the stale "
                "manifest already carries. Pass .option('checkpointLocation',"
                " ...) on the writeStream to restore exactly-once keying.",
                stacklevel=2,
            )
        if qid is not None and manifest.get("query_id") not in (None, qid):
            # a different query (fresh checkpoint) owns this target now:
            # its batch ids restart at 0, so the stale batches must not
            # alias them — supersede the old query's output entirely
            # (tombstoned for the retention grace, like batch overwrite)
            superseded = _all_part_files(manifest)
            manifest = {"format": "jsonl", "batches": []}
        else:
            superseded = []
        if qid is not None:
            manifest["query_id"] = qid
        batches = manifest.setdefault("batches", [])
        if any(b["batch_id"] == batchId for b in batches):
            return  # replayed commit after restart: already visible
        parts = [
            {"file": m.filename, "n_rows": m.n_rows, "value_sum": m.value_sum}
            for m in messages
            if m is not None
        ]
        batches.append(
            {"batch_id": batchId, "parts": sorted(parts, key=lambda p: p["file"])}
        )
        tombstones, expired = _gc_tombstones(prior, superseded, self._inner._grace)
        if tombstones:
            manifest["gc"] = tombstones
        else:
            manifest.pop("gc", None)
        _atomic_write_manifest(self._path, manifest)
        for name in expired:
            try:
                os.remove(os.path.join(self._path, name))
            except FileNotFoundError:
                pass

    def abort(self, messages, batchId: int) -> None:
        self._inner.abort(messages)


class ManifestJsonlSink(DataSource):
    """`format("manifest_jsonl")` — writer-only data source (module doc);
    serves BOTH batch writes (job-level manifest) and streaming writes
    (per-micro-batch manifest entries)."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ManifestJsonlWriter(self.options, overwrite=overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ManifestJsonlStreamWriter(self.options)


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(ManifestJsonlSink)


def manifest_stream_writer(
    df,
    path: str,
    *,
    audit_column: str | None = None,
    query_name: str | None = None,
    **options,
):
    """Configured ``writeStream`` for the manifest sink with the checkpoint
    location ALWAYS resolved into a sink option.

    Why this exists: `ManifestJsonlStreamWriter.commit` keys exactly-once
    dedup on the checkpoint's query id, which it can only read if it knows
    the checkpoint path. The Python Data Source runner process has NO
    SparkSession and receives ONLY explicit sink options (verified
    empirically: `SparkSession.getActiveSession()` is None there and the
    session-conf default `spark.sql.streaming.checkpointLocation` never
    reaches the options map — Spark materializes it as a RANDOM-uuid
    subdirectory the sink cannot discover). So conf-default resolution has
    to happen HERE, session-side, before start: explicit kwarg wins, else
    the session conf root plus a deterministic per-query subdirectory
    (queryName if given, else a hash of the target path — mirroring
    Spark's own ``<root>/<queryName>`` convention), passed down as the
    ``checkpointLocation`` sink option the commit path already honors.
    Raw ``.format("manifest_jsonl")`` users who pass neither still get the
    loud degraded-mode warning in `_commit_locked`.
    """
    import hashlib

    spark = df.sparkSession
    register_manifest_sink(spark)
    # Pop BOTH spellings unconditionally (a short-circuiting `or` would leave
    # the lowercase variant in **options as a conflicting duplicate sink
    # option when both are passed); only None means unset — an explicit
    # empty string is a caller error surfaced by Spark, not a silent
    # fall-through to the conf-derived path.
    cp = options.pop("checkpointLocation", None)
    cp_lower = options.pop("checkpointlocation", None)
    if cp is None:
        cp = cp_lower
    if cp is None:
        root = spark.conf.get("spark.sql.streaming.checkpointLocation", None)
        if root:
            sub = query_name or hashlib.sha256(
                os.path.abspath(path).encode()
            ).hexdigest()[:16]
            cp = os.path.join(root, sub)
    w = df.writeStream.format("manifest_jsonl").option("path", path)
    if audit_column is not None:
        w = w.option("audit_column", audit_column)
    if cp is not None:
        w = w.option("checkpointLocation", cp)
    if query_name is not None:
        w = w.queryName(query_name)
    for k, v in options.items():
        w = w.option(k, v)
    return w


def manifest_files(path: str) -> list[str]:
    """Absolute paths of the COMMITTED part files — the only reader-visible
    view of the directory (module docstring: never list the directory).
    Handles both manifest shapes: batch jobs write {"parts": [...]},
    streaming writes {"batches": [{"batch_id", "parts": [...]}, ...]}."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    parts = manifest.get("parts", [])
    for b in manifest.get("batches", []):
        parts.extend(b["parts"])
    return [os.path.join(path, p["file"]) for p in parts]
