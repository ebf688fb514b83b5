"""JDBC source (S3 variant): the reference reads its fact/dim tables from an
RDBMS (weekly-report.py:31-51 — psycopg connection + SELECTs against
Postgres). The Spark-native equivalent is `spark.read.jdbc` with bounded
partitioned reads so a 1000-executor cluster pulls table ranges in parallel
instead of one serial cursor.

No NETWORK database exists in this container, but Spark ships the embedded
Derby RDBMS in its classpath, so the full path — JDBC write, bounded
partitioned `read_jdbc` scan, predicate pushdown into the JDBCRelation — is
e2e-tested against a live database
(tests/test_ingest.py::test_jdbc_roundtrip_live_embedded_derby); a network
RDBMS (the reference's Postgres) differs only in the URL/credentials.

Scale notes:
- ALWAYS bound partitioned reads (partition_column + lower/upper/num):
  an unpartitioned JDBC read is one executor holding one cursor for the
  whole table — the RDBMS equivalent of a single-row-group parquet file.
- fetchsize trades driver round-trips for memory; 10k rows is the sweet
  spot for Postgres' default 8KB pages.
- Predicate pushdown works through the JDBC dialect: filter the DataFrame
  on indexed columns and Spark ships the WHERE clause to the database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Contract for the reference's `hospital_weekly` table (the prepped HHS
# fact, helper_load_hhs.py:45-67): what a JDBC scan of it must produce.
HOSPITAL_WEEKLY_JDBC_SCHEMA = T.StructType(
    [
        T.StructField("hospital_pk", T.StringType(), False),
        T.StructField("collection_week", T.DateType(), False),
        T.StructField("all_adult_hospital_beds_7_day_avg", T.DoubleType(), True),
        T.StructField("all_pediatric_inpatient_beds_7_day_avg", T.DoubleType(), True),
        T.StructField(
            "all_adult_hospital_inpatient_bed_occupied_7_day_avg",
            T.DoubleType(),
            True,
        ),
        T.StructField(
            "all_pediatric_inpatient_bed_occupied_7_day_avg", T.DoubleType(), True
        ),
        T.StructField("total_icu_beds_7_day_avg", T.DoubleType(), True),
        T.StructField("icu_beds_used_7_day_avg", T.DoubleType(), True),
        T.StructField("inpatient_beds_used_covid_7_day_avg", T.DoubleType(), True),
        T.StructField(
            "staffed_icu_adult_patients_confirmed_covid_7_day_avg",
            T.DoubleType(),
            True,
        ),
    ]
)


def jdbc_options(
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Build the option map for a (optionally range-partitioned) JDBC scan.

    The four partitioning options are all-or-nothing: Spark silently falls
    back to a single-cursor read when any is missing, which at fact-table
    size is an outage, not a slowdown — so we refuse half-specified bounds.
    """
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part) and any(p is None for p in part):
        raise ValueError(
            "partitioned JDBC read needs ALL of partition_column/lower_bound/"
            f"upper_bound/num_partitions; got {part!r}"
        )
    if lower_bound is not None and upper_bound is not None and lower_bound >= upper_bound:
        raise ValueError(f"lower_bound {lower_bound} must be < upper_bound {upper_bound}")
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Partition-parallel JDBC scan (S3 variant). Untestable without a live
    database in this container; the option/partitioning logic it delegates
    to is unit-tested."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
