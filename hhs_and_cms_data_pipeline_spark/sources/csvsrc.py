"""CSV ingest sources (SURVEY §2.1 S1/S2) with explicit schemas.

The reference infers types with pandas then fixes them post-hoc
(helper_load_hhs.py:45, load-quality.py:56-62); here schemas are declared
(SURVEY §1.3: never inferSchema in production paths — a schema drift fails
loudly at read instead of corrupting 100 TB downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# FIXTURES.md A1 — the 17 consumed HHS columns (helper_load_hhs.py:46-52).
HHS_BED_METRICS = (
    "all_adult_hospital_beds_7_day_avg",
    "all_pediatric_inpatient_beds_7_day_avg",
    "all_adult_hospital_inpatient_bed_occupied_7_day_avg",
    "all_pediatric_inpatient_bed_occupied_7_day_avg",
    "total_icu_beds_7_day_avg",
    "icu_beds_used_7_day_avg",
    "inpatient_beds_used_covid_7_day_avg",
    "staffed_icu_adult_patients_confirmed_covid_7_day_avg",
)

HHS_WEEKLY_SCHEMA = T.StructType(
    [
        T.StructField("hospital_pk", T.StringType(), False),
        T.StructField("state", T.StringType(), True),
        T.StructField("hospital_name", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("zip", T.StringType(), True),  # string: leading zeros
        T.StructField("fips_code", T.StringType(), True),
        T.StructField("geocoded_hospital_address", T.StringType(), True),
        T.StructField("collection_week", T.StringType(), True),
    ]
    + [T.StructField(m, T.DoubleType(), True) for m in HHS_BED_METRICS]
)

# FIXTURES.md A2 — CMS quality CSV headers contain spaces (load-quality.py:106-114).
CMS_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("Facility ID", T.StringType(), False),
        T.StructField("Facility Name", T.StringType(), True),
        T.StructField("City", T.StringType(), True),
        T.StructField("State", T.StringType(), True),
        T.StructField("ZIP Code", T.StringType(), True),
        T.StructField("Hospital Ownership", T.StringType(), True),
        T.StructField("Emergency Services", T.StringType(), True),
        T.StructField("Hospital Type", T.StringType(), True),
        T.StructField("Hospital overall rating", T.StringType(), True),
    ]
)


def _read_by_name(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Header-NAME-based CSV binding. Passing an explicit schema together
    with header=True binds columns POSITIONALLY (the header is only
    skipped), so a real-world file with reordered or extra columns — the
    HHS weekly drop has ~100 columns in its own order — would silently
    scramble fields into the wrong columns. Instead: read every column as
    a header-named string (pandas-read_csv semantics, matching the
    reference), fail loudly if a declared column is missing, then select
    by NAME and cast to the declared types. Extra columns are dropped by
    the projection; column order in the file is irrelevant."""
    raw = spark.read.csv(path, header=True, inferSchema=False, mode="PERMISSIVE")
    missing = [f.name for f in schema.fields if f.name not in raw.columns]
    if missing:
        raise ValueError(
            f"CSV at {path} lacks declared columns {missing}; header has "
            f"{raw.columns[:20]}..."
        )
    from pyspark.sql import functions as F

    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def read_hhs_weekly(spark: SparkSession, path: str) -> DataFrame:
    """S1: HHS weekly CSV scan (helper_load_hhs.py:45). Columns bind by
    header name (see _read_by_name); extra raw columns beyond the declared
    17 are dropped by the name projection."""
    return _read_by_name(spark, path, HHS_WEEKLY_SCHEMA)


def read_cms_quality(spark: SparkSession, path: str) -> DataFrame:
    """S2: CMS quality CSV scan (load-quality.py:56-62). Name-bound like
    read_hhs_weekly. Spark partitions the file natively — no 1000-row
    driver-side batching needed (K1)."""
    return _read_by_name(spark, path, CMS_QUALITY_SCHEMA)
