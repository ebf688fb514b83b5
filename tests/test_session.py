"""ensure_session_conf error-handling contract: static-conf rejections are
ignorable (the value is fixed for the session's lifetime), everything else
must surface — a typo'd value silently no-op'ing would hide a real misconfig.
"""

from __future__ import annotations

import pytest

from hhs_and_cms_data_pipeline_spark import session as S


def test_bad_conf_value_raises(spark, monkeypatch):
    good = spark.conf.get("spark.sql.shuffle.partitions")
    monkeypatch.setattr(
        S,
        "_SESSION_CONF",
        {**S._SESSION_CONF, "spark.sql.shuffle.partitions": "not-a-number"},
    )
    with pytest.raises(Exception):
        S.ensure_session_conf(spark)
    spark.conf.set("spark.sql.shuffle.partitions", good)


def test_static_conf_is_swallowed(spark, monkeypatch):
    # catalogImplementation is static: set at session build, rejected at
    # runtime with CANNOT_MODIFY_CONFIG — ensure_session_conf must not raise.
    monkeypatch.setattr(
        S,
        "_SESSION_CONF",
        {**S._SESSION_CONF, "spark.sql.catalogImplementation": "hive"},
    )
    S.ensure_session_conf(spark)


def test_good_confs_apply(spark):
    S.ensure_session_conf(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
