"""S11 — a landing-zone LEDGER as a Spark 4 streaming Python Data Source.

Spark's built-in file source tracks "which files are new" by directory
listing + modification time. Real landing zones usually publish a LEDGER
instead: an append-only sequence of data files where position in the
sequence IS the offset — replayable, exactly-once by construction, no
mtime races. This module states that contract as a
`SimpleDataSourceStreamReader` ("event_ledger"): the offset is
`{"idx": N}` (files [0, N) consumed), `read` serves exactly one ledger
file per micro-batch, and `readBetweenOffsets` re-serves any committed
range bit-identically for recovery — the replay path the e2e test
exercises explicitly.

Batch mode (`DataSource.reader`) reads the WHOLE ledger with one input
partition per file — so the same registered query surface can audit a
ledger at rest. Rows are (file_seq, event_id, user_id, event_type,
value): the raw columns plus the provenance position every ingestion
pipeline wants to carry.

Scale notes: one ledger file per micro-batch is the test-friendly
setting; a deployment batches `idx` ranges. The simple-reader protocol
runs `read` on the DRIVER and ships rows to executors via an internal
exchange — right for control-plane-sized feeds (the reference's weekly
drops); petabyte feeds use the partition-planning `streamReader` with
executor-side reads, which this source's batch half already demonstrates.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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


def _read_ledger_file(path: str, name: str, seq: int) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(path, name),
        columns=["event_id", "user_id", "event_type", "value"],
    )
    for eid, uid, et, val in zip(*(tbl.column(c).to_pylist() for c in
                                   ("event_id", "user_id", "event_type", "value"))):
        yield (seq, eid, uid, et, val)


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

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_ledger_file(partition.path, partition.name, partition.seq)


class EventLedgerStreamReader(SimpleDataSourceStreamReader):
    """Streaming half: offset = number of ledger files consumed."""

    def __init__(self, path: str):
        self._path = path

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = _ledger_files(self._path)
        idx = int(start["idx"])
        if idx >= len(files):
            # exhausted: MUST be an iterator (the prefetch wrapper probes
            # it with next() to verify emptiness when offsets don't move)
            return iter(()), {"idx": idx}
        # one ledger file per micro-batch (module docstring); a LIST, not
        # a generator — the simple-reader prefetcher copies the cached
        # batch for replay, and generators don't copy (driver-sized
        # batches are this protocol's contract anyway, see scale notes)
        return list(_read_ledger_file(self._path, files[idx], idx)), {"idx": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = _ledger_files(self._path)
        out = []
        for i in range(int(start["idx"]), int(end["idx"])):
            out.extend(_read_ledger_file(self._path, files[i], i))
        return out

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

    def simpleStreamReader(self, schema) -> EventLedgerStreamReader:
        return EventLedgerStreamReader(self.options["path"])


def register_event_ledger(spark) -> None:
    spark.dataSource.register(EventLedgerDataSource)
