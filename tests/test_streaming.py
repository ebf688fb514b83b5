"""Structured Streaming tests: availableNow drain == batch result; foreachBatch
upsert sink is idempotent across restarts (SURVEY §2.10)."""

from __future__ import annotations

from hhs_and_cms_data_pipeline_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    stream_upsert_sink,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def _canon(rows):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n_events"], repr(r["sum_value"]))
        for r in rows
    )


def test_available_now_matches_batch(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMOKE)
    result = tumbling_counts(stream)
    out = run_available_now(result, "t_stream_hourly", str(tmp_path / "ckpt"))

    from hhs_and_cms_data_pipeline_spark.registry import all_specs

    batch = all_specs()["stream_tumbling_hourly"].builder(spark, SF_SMOKE)
    assert _canon(out.collect()) == _canon(batch.collect())


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    target = str(tmp_path / "events_sink")

    def run_once(ckpt: str):
        stream = read_events_stream(spark, SF_SMOKE).select(
            "event_id", "user_id", "event_type", "value"
        )
        q = stream_upsert_sink(stream, target, ["event_id"], ckpt)
        q.awaitTermination()

    run_once(str(tmp_path / "c1"))
    n1 = spark.read.parquet(target).count()
    # fresh checkpoint => the same files are re-delivered; the anti-join sink
    # must swallow them (exactly-once effect without a transactional store)
    run_once(str(tmp_path / "c2"))
    n2 = spark.read.parquet(target).count()
    assert n1 == n2 > 0
    assert spark.read.parquet(target).select("event_id").distinct().count() == n1


def test_stateful_sessionize_crosses_batches(spark, tmp_path):
    """The stateful sessionizer must see multiple micro-batches (state is
    really carried across them) and agree with the batch gaps-and-islands."""
    from hhs_and_cms_data_pipeline_spark.registry import all_specs
    from hhs_and_cms_data_pipeline_spark.streaming.stateful import (
        run_stateful_sessionize,
        stage_chronological_files,
    )

    stage = stage_chronological_files(spark, SF_SMOKE, str(tmp_path / "stage"))
    final, n_batches = run_stateful_sessionize(
        spark, stage, str(tmp_path / "ckpt"), "t_stateful_sessions"
    )
    assert n_batches >= 2, "expected several chronological micro-batches"

    batch = all_specs()["stream_sessionize"].builder(spark, SF_SMOKE)
    canon = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert canon(final.collect()) == canon(batch.collect())
