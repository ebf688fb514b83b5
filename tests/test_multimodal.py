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


def test_unsupported_codec_still_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def _make_bmp(w: int, h: int, rgb_rows: list[list[tuple]]) -> bytes:
    """Minimal 24bpp BI_RGB bottom-up BMP writer for tests."""
    import struct

    row_sz = (w * 3 + 3) & ~3
    px = bytearray()
    for row in reversed(rgb_rows):  # bottom-up storage
        for r, g, b in row:
            px += bytes((b, g, r))
        px += b"\x00" * (row_sz - w * 3)
    off = 14 + 40
    size = off + len(px)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return bytes(header + info + px)


def test_bmp_decodes_for_real():
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    img = decode_image(_make_bmp(3, 2, rows))
    assert (img["width"], img["height"], img["mode"]) == (3, 2, "RGB")
    got = [
        [tuple(img["pixels"][3 * (y * 3 + x) : 3 * (y * 3 + x) + 3]) for x in range(3)]
        for y in range(2)
    ]
    assert got == rows


def test_bmp_through_frame_features(spark):
    """A real BMP payload flows through the same mapInPandas pipeline as the
    opaque payloads: width/height come from the actual header, features from
    the pixel histogram."""
    import pandas as pd

    from hhs_and_cms_data_pipeline_spark.operators.multimodal import (
        extract_frame_features,
    )

    bmp = _make_bmp(2, 2, [[(0, 0, 0), (16, 16, 16)], [(32, 32, 32), (255, 255, 255)]])
    src = spark.createDataFrame([(1, bytearray(bmp))], "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in src.mapInPandas(extract_frame_features, FRAME_FEATURE_SCHEMA).collect()
    }
    r = out[1]
    assert (r["width"], r["height"]) == (2, 2)
    assert r["byte_len"] == len(bmp)
    # pixel-byte histogram: 3 bytes in bin0, 3 in bin1, 3 in bin2, 3 in bin15
    feats = r["features"]
    assert feats[0] == feats[1] == feats[2] == feats[15] == 3 / 12
    assert abs(sum(feats) - 1.0) < 1e-9
    # plain pandas path agrees (no Spark roundtrip drift)
    [pdf] = list(
        extract_frame_features(iter([pd.DataFrame({"doc_id": [1], "payload": [bmp]})]))
    )
    assert pdf.iloc[0]["width"] == 2 and pdf.iloc[0]["height"] == 2


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
