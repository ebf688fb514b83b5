"""Registry-wide output-contract tests.

The driver's correctness gate canonicalizes each query's result with pandas
``sort_values`` over every column; an ARRAY/MAP/STRUCT cell raises
``TypeError: unhashable type: 'numpy.ndarray'`` and turns the row red even
when the values are bit-exact (CORRECTNESS_r11: text_inverted_index,
mm_keyframe_select). So the registry contract is: every registered query's
output schema is scalar-only. Complex values must be serialized
(array_join / to_json) or exploded to rows before the final select.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hhs_and_cms_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_driver_hashable, duckdb_connection

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_output_schema_is_scalar_only(name, spark):
    """Build the plan (no execution needed — schema is an analysis-time
    property) and reject any complex-typed output column."""
    df = SPECS[name].builder(spark, SF_SMOKE)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} emits driver-unhashable complex-typed columns {bad}: "
        "serialize with F.array_join / F.to_json or explode to scalar rows"
    )


def test_guard_fails_on_deliberate_array_output(spark):
    """The replica guard must actually fire: a deliberately array-emitting
    Spark frame and a deliberately list-emitting DuckDB oracle both raise."""
    arr_df = spark.range(3).select(F.array(F.col("id")).alias("xs"))
    with pytest.raises(AssertionError, match="complex-typed"):
        assert_driver_hashable(arr_df)

    ok_df = spark.range(3).select(F.col("id"))
    con = duckdb_connection(SF_SMOKE)
    try:
        with pytest.raises(AssertionError, match="complex-typed"):
            assert_driver_hashable(ok_df, con, "SELECT [1, 2] AS xs")
        # struct outputs are rejected too
        with pytest.raises(AssertionError, match="complex-typed"):
            assert_driver_hashable(ok_df, con, "SELECT {'a': 1} AS s")
        # scalar-only passes both sides
        assert_driver_hashable(ok_df, con, "SELECT 1 AS id")
    finally:
        con.close()
