"""S11 — a landing-zone LEDGER as a Spark 4 streaming Python Data Source.

Spark's built-in file source tracks "which files are new" by directory
listing + modification time. Real landing zones usually publish a LEDGER
instead: an append-only sequence of data files where position in the
sequence IS the offset — replayable, exactly-once by construction, no
mtime races. This module states that contract as a partition-planning
`DataSourceStreamReader` ("event_ledger"): the offset is `{"idx": N}`
(files [0, N) consumed), each micro-batch covers every file appended
since the last trigger, and `partitions(start, end)` plans ONE INPUT
PARTITION PER LEDGER FILE whose `read` runs on EXECUTORS — the same
per-file parallelism as the batch half, so a large feed never funnels
through the driver. Recovery replays any committed `[start, end)` range
bit-identically by re-planning the same file partitions — the replay
path the e2e test exercises explicitly.

Batch mode (`DataSource.reader`) reads the WHOLE ledger with one input
partition per file — so the same registered query surface can audit a
ledger at rest. Rows are (file_seq, event_id, user_id, event_type,
value): the raw columns plus the provenance position every ingestion
pipeline wants to carry.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EVENT_LEDGER_DDL = (
    "file_seq int, event_id bigint, user_id bigint, event_type string, "
    "value double"
)


def _ledger_files(path: str) -> list[str]:
    """The ledger sequence: lexicographic name order IS the append order
    (the staging helper emits part-0..part-9; a production ledger
    zero-pads or uses a manifest)."""
    return sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )


def _read_ledger_file(path: str, name: str, seq: int) -> Iterator:
    """Yield `pyarrow.RecordBatch`es (Spark 4's Python Data Source `read()`
    accepts Arrow batches directly) — the whole parquet -> Arrow -> Spark
    trip stays columnar; no per-row Python tuples are ever materialized.
    Batches stream one row group at a time (`iter_batches`), so a large
    ledger file never sits fully materialized in the task's memory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["event_id", "user_id", "event_type", "value"]
    pf = pq.ParquetFile(os.path.join(path, name))
    for batch in pf.iter_batches(columns=cols):
        # prepend the provenance position; cast defensively so the batch
        # schema always equals EVENT_LEDGER_DDL no matter how the staging
        # writer typed the columns (Spark rejects mismatched Arrow schemas)
        yield pa.RecordBatch.from_arrays(
            [
                pa.repeat(pa.scalar(seq, pa.int32()), batch.num_rows),
                batch.column("event_id").cast(pa.int64()),
                batch.column("user_id").cast(pa.int64()),
                batch.column("event_type").cast(pa.string()),
                batch.column("value").cast(pa.float64()),
            ],
            names=["file_seq", *cols],
        )


class _FilePartition(InputPartition):
    def __init__(self, path: str, name: str, seq: int):
        self.path, self.name, self.seq = path, name, seq


class EventLedgerBatchReader(DataSourceReader):
    """Batch half: one input partition per ledger file."""

    def __init__(self, path: str):
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _FilePartition(self._path, n, i)
            for i, n in enumerate(_ledger_files(self._path))
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_ledger_file(partition.path, partition.name, partition.seq)


class EventLedgerStreamReader(DataSourceStreamReader):
    """Streaming half: offset = number of ledger files consumed; each
    micro-batch's ``[start, end)`` file range is planned as one input
    partition per ledger file and read executor-side (module docstring).
    The reader keeps NO mutable state — offsets are pure functions of the
    ledger directory — so a restarted query replans any committed range
    identically from the checkpoint alone."""

    def __init__(self, path: str):
        self._path = path

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(_ledger_files(self._path))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = _ledger_files(self._path)
        return [
            _FilePartition(self._path, files[i], i)
            for i in range(int(start["idx"]), int(end["idx"]))
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_ledger_file(partition.path, partition.name, partition.seq)

    def commit(self, end: dict) -> None:
        pass  # ledger files are immutable; nothing to clean


class EventLedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_ledger"

    def schema(self) -> str:
        return EVENT_LEDGER_DDL

    def reader(self, schema) -> EventLedgerBatchReader:
        return EventLedgerBatchReader(self.options["path"])

    def streamReader(self, schema) -> EventLedgerStreamReader:
        return EventLedgerStreamReader(self.options["path"])


def register_event_ledger(spark) -> None:
    spark.dataSource.register(EventLedgerDataSource)
