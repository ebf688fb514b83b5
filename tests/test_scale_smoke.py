"""Scale-up sanity: the flagship plan must survive a 10x bigger fact.

Synthesizes a 10x lineitem (union of shifted copies — ~6M rows at sf0.1's
shape using sf0.01 input => 600k, cheap enough for CI) and runs the
flagship-shaped aggregation. Catches anything that silently depends on the
small input: broadcast of a fact side, collect-based loops, single-partition
bottlenecks in the aggregation path."""

from __future__ import annotations

from pyspark.sql import functions as F

from hhs_and_cms_data_pipeline_spark.functions.exact import dsum
from hhs_and_cms_data_pipeline_spark.sources import table
from tests.conftest import SF_SMOKE


def test_flagship_shape_at_10x(spark):
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    big = li
    for i in range(1, 10):
        big = big.unionAll(
            li.select(
                (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias("l_orderkey"),
                "l_extendedprice",
                "l_discount",
            )
        )
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    out = (
        big.join(o, big.l_orderkey == o.o_orderkey)  # only the 1x slice matches
        .groupBy("o_custkey")
        .agg(dsum(net, "net"), F.count(F.lit(1)).alias("n"))
    )
    rows = out.collect()
    assert len(rows) > 0
    # the 10x union must not change per-key results vs the 1x join
    base = {
        r["o_custkey"]: (r["net"], r["n"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(net, "net"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["o_custkey"]: (r["net"], r["n"]) for r in rows}
    assert got == base


def test_d5_all_pairs_guard_refuses_large_corpus(spark, monkeypatch):
    """The exact all-pairs embedding dedup is bounded by contract: above the
    cap it must refuse with a pointer to the blocked D6 path."""
    import pytest

    from hhs_and_cms_data_pipeline_spark.operators import dedup

    monkeypatch.setattr(dedup, "_D5_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup.dedup_embedding_cosine(spark, SF_SMOKE)


def test_bucketed_gc_owner_liveness():
    """GC of foreign bucketed-table dirs keys on owner-process liveness
    (pid embedded in the tag), never on mtime — a live long-running
    session's hour-old tables must survive (round-2 ADVICE)."""
    import os

    from hhs_and_cms_data_pipeline_spark.operators.windows_scale import (
        _bkt_owner_alive,
        _bkt_tag,
    )

    tag = _bkt_tag("/root/testdata/sf0.001")
    assert tag.endswith(f"_p{os.getpid()}")
    assert _bkt_owner_alive(f"orders_bkt_{tag}")          # this process: alive
    assert not _bkt_owner_alive("orders_bkt_deadbeef_p999999999")  # dead pid
    assert not _bkt_owner_alive("orders_bkt_legacytag")   # pre-pid layout: collectable


def test_zorder_layout_enables_file_skipping(spark, tmp_path):
    """XS5's write-path claim, exercised: range-partitioning the fact by
    the Morton key and writing parquet must produce files whose
    (l_partkey min, max) footer stats let a partkey predicate skip most
    files — versus a hash-spread layout of the SAME data where every file
    spans nearly the full key range and nothing can be skipped."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from hhs_and_cms_data_pipeline_spark.operators.windows_scale import _z_value
    from hhs_and_cms_data_pipeline_spark.sources import table
    from tests.conftest import SF_SMOKE

    li = table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey")
    z = _z_value(
        F.col("l_partkey").bitwiseAND(F.lit(65535)),
        F.col("l_suppkey").bitwiseAND(F.lit(65535)),
    )
    keyed = li.select("l_partkey", "l_suppkey", z.alias("z"))
    zdir, rdir = str(tmp_path / "zsorted"), str(tmp_path / "random")
    keyed.repartitionByRange(8, "z").sortWithinPartitions("z").write.parquet(zdir)
    keyed.repartition(8).write.parquet(rdir)

    def overlap_fraction(d: str, lo: int, hi: int) -> float:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) >= 4, f"expected multiple files in {d}"
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("l_partkey")
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                hit += 1
        return hit / len(files)

    # a narrow partkey band: the z-clustered layout must localize it
    zfrac = overlap_fraction(zdir, 0, 63)
    rfrac = overlap_fraction(rdir, 0, 63)
    assert rfrac == 1.0, "hash-spread layout should overlap everywhere"
    assert zfrac <= 0.5, f"z-layout should skip most files, got {zfrac}"


def test_bloom_prefilter_prunes_without_losing_matches(spark):
    """XS6's broadcast-bitmap stage must (a) keep EVERY true match — bloom
    filters have no false negatives — and (b) actually prune: the false-
    positive passthrough among non-matching rows stays under 5% with the
    2-hash/128Kbit sizing, so the exact semi-join sees a fraction of the
    fact table. Guards the hash/bitmap arithmetic: a broken mask or word
    index would silently degrade to pass-everything (still correct, no
    longer a prefilter) or drop matches (caught here, not just by the
    oracle's aggregate)."""
    from hhs_and_cms_data_pipeline_spark.operators.windows_scale import (
        bloom_prefiltered_lineitem,
    )
    from hhs_and_cms_data_pipeline_spark.sources import table
    from tests.conftest import SF_SMOKE

    pruned, urgent = bloom_prefiltered_lineitem(spark, SF_SMOKE)
    li = table(spark, SF_SMOKE, "lineitem")
    true_matches = li.join(
        urgent, li.l_orderkey == urgent.o_orderkey, "semi"
    ).count()
    n_total = li.count()
    n_pruned = pruned.count()
    survivors = pruned.join(
        urgent, pruned.l_orderkey == urgent.o_orderkey, "semi"
    ).count()
    assert survivors == true_matches, "bloom stage dropped true matches"
    fp = (n_pruned - true_matches) / max(1, n_total - true_matches)
    assert fp < 0.05, f"bloom passthrough too high: {fp:.3f}"


def test_shingle_dedup_shape_at_10x(spark):
    """The round-8 build-side fix's scale smoke: push a 10x documents
    union (9 shifted clone sets) through the PRODUCTION _jaccard_pairs
    DAG. Clones multiply every shingle's df by 10, so the df cap bites
    harder and the candidate join's rare filter is live on BOTH sides.
    Asserts the plan completes at 10x, every clone pair it scores is
    jaccard 1.0 exactly, and clone pairs exist for every document whose
    shingles stayed under the cap — i.e. the skew valve trims candidates
    without corrupting the scores that survive."""
    from pyspark.sql import functions as F

    from hhs_and_cms_data_pipeline_spark.operators.dedup import (
        _JACCARD_TAU,
        _jaccard_pairs,
    )
    from hhs_and_cms_data_pipeline_spark.sources import table

    SHIFT = 1_000_000
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    big = docs
    for i in range(1, 10):
        big = big.unionAll(
            docs.select((F.col("doc_id") + F.lit(i * SHIFT)).alias("doc_id"), "text")
        )
    pairs = _jaccard_pairs(big).filter(F.col("jaccard") >= _JACCARD_TAU).collect()
    assert len(pairs) > 0
    clone_pairs = [
        r for r in pairs if r.doc_a % SHIFT == r.doc_b % SHIFT
    ]
    assert len(clone_pairs) > 0
    assert all(r.jaccard == 1.0 for r in clone_pairs)
    # determinism across the 10x layout: the base-slice (both ids < SHIFT)
    # near-dup pairs equal the 1x run's pairs exactly
    base_pairs = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in pairs
        if r.doc_a < SHIFT and r.doc_b < SHIFT
    )
    one_x = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in _jaccard_pairs(docs)
        .filter(F.col("jaccard") >= _JACCARD_TAU)
        .collect()
    )
    # 10x raises shingle dfs, so the base slice can only LOSE candidates
    # whose every shared shingle crossed the cap — never gain or rescore
    assert set(base_pairs) <= set(one_x)


def test_rate_limit_hot_key_burst(spark):
    """U5 skew stress: ONE user firing 200k events inside a single
    10-minute window (the exact bot pattern the limiter exists for) plus a
    sprinkle of normal traffic. The window operator must stream the hot
    key (sort-based, no per-key materialization that OOMs), keep EXACTLY
    the earliest event of the burst, and report the full burst size."""
    from pyspark.sql import functions as F

    burst = spark.range(200_000).select(
        (F.col("id") + 1_000_000).alias("event_id"),
        F.lit(7777).alias("user_id"),
        F.lit("click").alias("event_type"),
        # ts strictly increasing with id, all 200k inside ONE 10-minute
        # bucket — the earliest (the survivor) is event_id 1_000_000
        (F.lit(1_600_000_000_000_000) + F.col("id")).alias("ts_us"),
    )
    normal = spark.range(50).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.lit(1_600_000_000_000_000) + F.col("id") * 3_600_000_000).alias("ts_us"),
    )
    ev = burst.unionByName(normal).select(
        "event_id", "user_id", "event_type", "ts_us",
        F.floor(F.col("ts_us") / F.lit(600_000_000)).cast("long").alias("win"),
    )
    from pyspark.sql import Window

    wkey = Window.partitionBy("user_id", "win")
    w = wkey.orderBy("ts_us", "event_id")
    kept = (
        ev.select(
            "event_id", "user_id", "win",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wkey).alias("n_in_window"),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    hot = [r for r in kept if r["user_id"] == 7777]
    assert len(hot) == 1
    assert hot[0]["event_id"] == 1_000_000 and hot[0]["n_in_window"] == 200_000
    assert len(kept) == 1 + 50  # normal rows land in distinct windows


def test_scd2_hot_user_alternating_runs(spark):
    """K12 skew stress: one user alternating state every event for 200k
    events — the worst case for the gaps-and-islands derivation (every
    event is a run boundary, so the run relation is as large as the
    input). The single-exchange window/SortAggregate stack must stream it
    and produce 200k maximal runs that tile the timeline."""
    from pyspark.sql import functions as F, Window

    ev = spark.range(200_000).select(
        F.col("id").alias("event_id"),
        F.lit(42).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        (F.lit(1_600_000_000_000_000) + F.col("id") * 1_000_000).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    runs = ev.select(
        "user_id", "event_type", "ts_us",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_id"),
    )
    grouped = runs.groupBy("user_id", "run_id").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n"),
    )
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_run"),
    ).collect()[0]
    assert agg["n_runs"] == 200_000      # every event its own maximal run
    assert agg["n_events"] == 200_000
    assert agg["max_run"] == 1


def test_minhash_lsh_hot_bucket_burst(spark):
    """LSH band-join skew stress (the dedup twin of the U5/K12 hot-key
    bursts): 2,000 IDENTICAL documents all hash into the SAME (band, sig)
    bucket in every band — the worst-case hot bucket the band self-join
    can see. The quadratic blowup is the OPERATOR'S OWN candidate set
    (identical docs really are all-pairs duplicates), so the contract is
    exactness, not trimming: the join must stream the bucket under AQE
    skew handling (no OOM, no silent cap) and verify every clone pair at
    jaccard exactly 1.0, while the base corpus's near-dup pairs come out
    IDENTICAL to the 1x run (the burst cannot rescore or suppress
    unrelated pairs — bucket-locality means a hot bucket touches only its
    own members)."""
    from hhs_and_cms_data_pipeline_spark.operators.dedup import (
        _JACCARD_TAU,
        minhash_verified_pairs,
    )

    K = 2_000
    SHIFT = 10_000_000
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    one_x = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_verified_pairs(docs).collect()
    )
    clone_text = "the quick brown fox jumps over the lazy dog again and again"
    clones = spark.range(K).select(
        (F.col("id") + F.lit(SHIFT)).alias("doc_id"),
        F.lit(clone_text).alias("text"),
    )
    burst = docs.unionAll(clones)
    pairs = minhash_verified_pairs(burst).localCheckpoint(eager=False)
    both_clones = pairs.filter(
        (F.col("doc_a") >= SHIFT) & (F.col("doc_b") >= SHIFT)
    )
    stats = both_clones.agg(
        F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("mn")
    ).collect()[0]
    # all-pairs among identical docs, every one exact 1.0
    assert stats["n"] == K * (K - 1) // 2
    assert stats["mn"] == 1.0
    # no cross pairs unless a base doc is genuinely near the clone text
    cross = pairs.filter(
        (F.col("doc_a") < SHIFT) & (F.col("doc_b") >= SHIFT)
    )
    assert all(r.jaccard >= _JACCARD_TAU for r in cross.collect())
    base = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in pairs.filter(
            (F.col("doc_a") < SHIFT) & (F.col("doc_b") < SHIFT)
        ).collect()
    )
    assert base == one_x
