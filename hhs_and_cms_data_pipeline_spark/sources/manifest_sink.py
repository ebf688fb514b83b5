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
"""

from __future__ import annotations

import json
import os
import uuid
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
        # manifest and deletes the superseded part files.
        self._overwrite = overwrite

    def write(self, iterator: Iterator) -> PartCommit:
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
        prior = _load_manifest(self._path)
        new_parts = [
            {"file": m.filename, "n_rows": m.n_rows, "value_sum": m.value_sum}
            for m in messages
            if m is not None
        ]
        if self._overwrite:
            # everything the prior manifest named (batch parts AND any
            # streaming batches) is superseded — delete after the atomic
            # rename below so readers never observe a manifest naming a
            # missing file. Residual race, stated plainly: a reader that
            # loaded the OLD manifest before the rename and opens its
            # files after the delete hits FileNotFound — the standard
            # snapshot-GC race every table format has; production formats
            # solve it with retention grace (cf. sinks.py
            # write_parquet_atomic's gc_grace_seconds), which this demo
            # sink trades for immediate space reclamation.
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
        _atomic_write_manifest(self._path, manifest)
        for name in superseded:
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
        manifest = _load_manifest(self._path) or {"format": "jsonl", "batches": []}
        # resolved at commit time, not __init__: <checkpoint>/metadata is
        # guaranteed to exist once batches are committing
        qid = _checkpoint_query_id(self._options)
        if qid is not None and manifest.get("query_id") not in (None, qid):
            # a different query (fresh checkpoint) owns this target now:
            # its batch ids restart at 0, so the stale batches must not
            # alias them — supersede the old query's output entirely
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
        _atomic_write_manifest(self._path, manifest)
        for name in superseded:
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
