from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhs_and_cms_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
# The differential-oracle matrix runs at sf0.01 BY DEFAULT — the same data
# scale the driver's correctness gate uses, so the suite's 245/245 claim
# and the driver's bar rest on identical inputs. Export
# SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.001 for a faster smoke pass.
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("engine-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
