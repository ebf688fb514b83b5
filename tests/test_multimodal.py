"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import pytest

from hhs_and_cms_data_pipeline_spark.operators.multimodal import (
    FRAME_FEATURE_SCHEMA,
    decode_image,
    fake_decode,
    frame_features_df,
    mm_frame_features,
)
from tests.conftest import SF_SMOKE


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world")
    b = fake_decode(b"hello world")
    assert a == b
    assert len(a["features"]) == 16
    assert abs(sum(a["features"]) - 1.0) < 1e-9


def test_frame_features_schema_and_rows(spark):
    df = frame_features_df(spark, SF_SMOKE)
    assert df.schema == FRAME_FEATURE_SCHEMA
    rows = df.collect()
    assert len(rows) == 500  # one feature row per document
    r = {x["doc_id"]: x for x in rows}[0]
    assert r["modality"] == "image"
    assert r["byte_len"] > 0
    assert len(r["features"]) == 16
    # features are a distribution over byte nibbles
    assert abs(sum(r["features"]) - 1.0) < 1e-9
    # deterministic across runs (pure function of payload)
    r2 = {x["doc_id"]: x for x in frame_features_df(spark, SF_SMOKE).collect()}[0]
    assert r["features"] == r2["features"]


def test_frame_features_registered_projection_flattens(spark):
    # the driver-facing query flattens features -> f00..f15 doubles and
    # matches the array form elementwise
    flat = {r["doc_id"]: r for r in mm_frame_features(spark, SF_SMOKE).collect()}
    arr = {r["doc_id"]: r for r in frame_features_df(spark, SF_SMOKE).collect()}
    assert set(flat) == set(arr)
    r, ra = flat[0], arr[0]
    assert [r[f"f{k:02d}"] for k in range(16)] == list(ra["features"])


def test_resize_schema_and_determinism(spark):
    from hhs_and_cms_data_pipeline_spark.operators.multimodal import (
        RESIZE_SCHEMA,
        mm_resize,
        resize_df,
    )

    df = resize_df(spark, SF_SMOKE)
    assert df.schema == RESIZE_SCHEMA
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 500
    r = rows[0]
    assert r["dst_width"] == r["dst_height"] == 8
    assert len(r["thumb"]) == 64
    r2 = {x["doc_id"]: x for x in resize_df(spark, SF_SMOKE).collect()}[0]
    assert bytes(r["thumb"]) == bytes(r2["thumb"])
    # registered projection hex-encodes the same bytes
    rh = {x["doc_id"]: x for x in mm_resize(spark, SF_SMOKE).collect()}[0]
    assert rh["thumb_hex"] == bytes(r["thumb"]).hex().upper()
