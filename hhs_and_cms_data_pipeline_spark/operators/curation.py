"""Sampling, sharding, and curation-pipeline operators over `documents` —
the selection half of a training-data pipeline (dedup.py is the removal
half): deterministic Bernoulli sampling, stratified fractions, fixed-k per
group, reason-coded quality filtering, corpus statistics, and training-shard
assignment.

Determinism doctrine: every sampling decision is a pure function of the row
key (md5 of the doc_id, identical in Spark and DuckDB), never of partition
layout, RNG state, or cluster size — a local[32] run and a 1000-executor run
select the SAME sample. This is what makes sampled training sets
reproducible and incrementally extendable (re-running over grown data keeps
every previously selected row whose key still qualifies).

Scale posture (100 TB): C1/C4/C5 are map-only or single hash-shuffle; the
ranked samplers (C2/C3/C6) shuffle once on the stratum key and window within
it — strata (source, lang, shard) are low-cardinality but each stratum
streams through the window operator sorted, nothing driver-side. For
billion-row strata, raise the shard count (C6) or pre-aggregate; no operator
here materializes a stratum in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, sql_davg
from ..registry import register
from ..session import ensure_session_conf
from ..sources import table

# Hash key: md5 over the decimal string of doc_id — bit-identical in Spark
# and DuckDB, uniform over the hex space, independent of row order.


def _hash_key() -> F.Column:
    return F.md5(F.col("doc_id").cast("string"))


_SQL_HASH_KEY = "md5(CAST(doc_id AS VARCHAR))"

# ~10% Bernoulli: first 4 hex nibbles < 0x1999 (6553/65536 = 9.999%).
_BERNOULLI_HEX = "1999"


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr({_SQL_HASH_KEY}, 1, 4) < '{_BERNOULLI_HEX}'
    ORDER BY doc_id
    """,
    tags=("C1",),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample: keep rows whose key-hash prefix
    falls under the rate threshold. Unlike DataFrame.sample() (seeded per
    partition — resampling under repartition), membership depends only on
    doc_id, so the sample is stable across runs, cluster sizes, and data
    growth. Map-only: the predicate is a per-row hash compare, pushed as a
    filter with no shuffle."""
    ensure_session_conf(spark)
    return (
        table(spark, sf_dir, "documents")
        .filter(F.substring(_hash_key(), 1, 4) < _BERNOULLI_HEX)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_STRAT_FRAC = 0.2


@register(
    "sample_stratified_frac",
    oracle=f"""
    SELECT doc_id, source, sample_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_SQL_HASH_KEY}, doc_id)
               AS sample_rank,
             COUNT(*) OVER (PARTITION BY source) AS n_stratum
      FROM documents)
    WHERE sample_rank <= CAST(ceil({_STRAT_FRAC} * n_stratum) AS BIGINT)
    ORDER BY doc_id
    """,
    tags=("C2",),
)
def sample_stratified_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample: per `source` stratum, keep the ceil(frac*n)
    rows with the smallest key-hash. Exact per-stratum proportions (unlike
    Bernoulli, which only hits the rate in expectation), still a pure
    function of doc_id within each stratum. One shuffle on `source`; both
    window functions share the partition spec so Spark plans a single
    exchange + sort."""
    ensure_session_conf(spark)
    w = Window.partitionBy("source").orderBy(_hash_key(), "doc_id")
    wn = Window.partitionBy("source")
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("sample_rank"),
            F.count(F.lit(1)).over(wn).alias("n_stratum"),
        )
        .filter(
            F.col("sample_rank")
            <= F.ceil(F.lit(_STRAT_FRAC) * F.col("n_stratum")).cast("long")
        )
        .select("doc_id", "source", "sample_rank")
        .orderBy("doc_id")
    )


_FIXED_K = 5


@register(
    "sample_fixed_k_per_lang",
    oracle=f"""
    SELECT doc_id, lang, sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_SQL_HASH_KEY}, doc_id)
               AS sample_rank
      FROM documents)
    WHERE sample_rank <= {_FIXED_K}
    ORDER BY lang, sample_rank
    """,
    tags=("C3",),
)
def sample_fixed_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size sample: exactly k=5 docs per language (fewer if the group
    is smaller), chosen by smallest key-hash — the deterministic equivalent
    of per-group reservoir sampling. The rank<=k predicate lets Spark run
    the window as a top-k per group (rank pushdown in the window operator)
    instead of ranking whole strata."""
    ensure_session_conf(spark)
    w = Window.partitionBy("lang").orderBy(_hash_key(), "doc_id")
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).cast("long").alias("sample_rank"))
        .filter(F.col("sample_rank") <= _FIXED_K)
        .orderBy("lang", "sample_rank")
    )


# Reason-coded quality gate. First failing rule wins; NULL reason = kept.
_MIN_CHARS = 100
_MAX_CHARS = 10_000
_MIN_TOKENS = 20
_MAX_AVG_TOKEN_LEN = 12.0


@register(
    "curation_filter_pipeline",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN n_chars < {_MIN_CHARS} THEN 'too_short'
             WHEN n_chars > {_MAX_CHARS} THEN 'too_long'
             WHEN len(string_split(text, ' ')) < {_MIN_TOKENS}
               THEN 'too_few_tokens'
             WHEN CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)
                  > {_MAX_AVG_TOKEN_LEN}
               THEN 'tokens_too_long'
           END AS drop_reason
    FROM documents
    ORDER BY doc_id
    """,
    tags=("C4",),
)
def curation_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reason-coded quality gate (Gopher/C4-style rule cascade): each doc is
    tagged with the FIRST rule it violates (length bounds, minimum token
    count, average-token-length ceiling) or NULL if it passes. Emitting the
    reason instead of silently filtering is what a curation pipeline needs
    for auditing drop rates per rule. Pure per-row column expressions —
    map-only, whole-stage codegen, no Python."""
    ensure_session_conf(spark)
    n_tok = F.size(F.split(F.col("text"), " "))
    avg_tok_len = (F.length("text") - n_tok + F.lit(1)).cast("double") / n_tok.cast(
        "double"
    )
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("n_chars") < _MIN_CHARS, "too_short")
            .when(F.col("n_chars") > _MAX_CHARS, "too_long")
            .when(n_tok < _MIN_TOKENS, "too_few_tokens")
            .when(avg_tok_len > _MAX_AVG_TOKEN_LEN, "tokens_too_long")
            .alias("drop_reason"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_stats_by_lang",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg("n_chars")} AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("C5",),
)
def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc count, total/average characters
    (decimal-exact average per functions/exact.py), distinct sources. One
    hash-shuffle on `lang` with map-side partial aggregation; COUNT(DISTINCT
    source) expands to the standard two-phase distinct aggregate."""
    ensure_session_conf(spark)
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            davg("n_chars", "avg_chars"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


_N_SHARDS = 16


@register(
    "corpus_shard_assignment",
    oracle=f"""
    SELECT doc_id,
           strpos('0123456789abcdef', substr({_SQL_HASH_KEY}, 1, 1)) - 1
             AS shard,
           row_number() OVER (
             PARTITION BY substr({_SQL_HASH_KEY}, 1, 1)
             ORDER BY {_SQL_HASH_KEY}, doc_id) AS pos_in_shard
    FROM documents
    ORDER BY shard, pos_in_shard
    """,
    tags=("C6",),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment: shard = first hash nibble (16 shards),
    position within shard = hash order — a deterministic global shuffle of
    the corpus, expressed scale-correctly: ranking is windowed PER SHARD
    (one exchange on the nibble, each shard sorted independently), never a
    global single-partition row_number. Readers stream shard files in
    pos_in_shard order and get a reproducible, well-mixed training order.
    At 100 TB, widen the nibble prefix (2 hex chars = 256 shards, 3 = 4096)
    to bound shard size; the plan shape is unchanged."""
    ensure_session_conf(spark)
    nibble = F.substring(_hash_key(), 1, 1)
    w = Window.partitionBy(nibble).orderBy(_hash_key(), "doc_id")
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (F.instr(F.lit("0123456789abcdef"), nibble) - 1).cast("long").alias("shard"),
            F.row_number().over(w).cast("long").alias("pos_in_shard"),
        )
        .orderBy("shard", "pos_in_shard")
    )
