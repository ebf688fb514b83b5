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


@dataclass
class PartCommit(WriterCommitMessage):
    filename: str
    n_rows: int
    value_sum: str  # exact decimal, serialized


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_jsonl sink requires option 'path'")
        self._path = path
        # which numeric column (if any) the per-part audit total sums —
        # a sink OPTION, not a hardcoded query-specific name
        self._audit_col = options.get("audit_column")

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
        parts = [
            {"file": m.filename, "n_rows": m.n_rows, "value_sum": m.value_sum}
            for m in messages
            if m is not None
        ]
        manifest = {
            "format": "jsonl",
            "parts": sorted(parts, key=lambda p: p["file"]),
            "n_rows": sum(p["n_rows"] for p in parts),
        }
        tmp = os.path.join(self._path, f".{MANIFEST_NAME}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.rename(tmp, os.path.join(self._path, MANIFEST_NAME))

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
    batch_id: after a driver restart Spark may re-commit the last batch,
    and re-registering its parts would double-count every row — the seen
    check makes the replayed commit a no-op, which together with
    uuid-named parts gives exactly-once visibility end to end."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_jsonl sink requires option 'path'")
        self._path = path
        self._inner = ManifestJsonlWriter(options)

    def write(self, iterator: Iterator) -> PartCommit:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self._path, exist_ok=True)  # empty micro-batch: no write() ran
        mpath = os.path.join(self._path, MANIFEST_NAME)
        manifest = {"format": "jsonl", "batches": []}
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
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
        tmp = os.path.join(self._path, f".{MANIFEST_NAME}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.rename(tmp, mpath)

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
        return ManifestJsonlWriter(self.options)

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
