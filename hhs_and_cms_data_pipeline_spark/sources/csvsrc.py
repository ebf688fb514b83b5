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


def read_hhs_weekly(spark: SparkSession, path: str) -> DataFrame:
    """S1: HHS weekly CSV scan (helper_load_hhs.py:45). Extra raw columns
    beyond the declared 17 are dropped by the schema projection."""
    return spark.read.csv(path, header=True, schema=HHS_WEEKLY_SCHEMA, mode="PERMISSIVE")


def read_cms_quality(spark: SparkSession, path: str) -> DataFrame:
    """S2: CMS quality CSV scan (load-quality.py:56-62). Spark partitions the
    file natively — no 1000-row driver-side batching needed (K1)."""
    return spark.read.csv(path, header=True, schema=CMS_QUALITY_SCHEMA, mode="PERMISSIVE")
