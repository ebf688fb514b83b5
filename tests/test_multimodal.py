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


def _make_png(w: int, h: int, rgb_rows: list[list[tuple]], filters: list[int]) -> bytes:
    """Minimal 8-bit RGB non-interlaced PNG writer for tests, with an
    explicit filter type per row so every unfilter branch (None/Sub/Up/
    Average/Paeth) gets exercised. Filters are applied over RAW neighbor
    bytes per the PNG spec; the decoder must reconstruct them exactly."""
    import struct
    import zlib

    raw_rows = [bytes(c for px in row for c in px) for row in rgb_rows]
    stride = w * 3
    stream = bytearray()
    for r, f in enumerate(filters):
        cur = raw_rows[r]
        prev = raw_rows[r - 1] if r else bytes(stride)
        out = bytearray()
        for i in range(stride):
            x = cur[i]
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                out.append(x)
            elif f == 1:
                out.append((x - a) & 0xFF)
            elif f == 2:
                out.append((x - b) & 0xFF)
            elif f == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                out.append((x - pred) & 0xFF)
        stream += bytes([f]) + out

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


_PNG_ROWS_5x5 = [
    [((x * 37 + y * 91 + c * 13) % 256 for c in range(3)) for x in range(5)]
    for y in range(5)
]
_PNG_ROWS_5x5 = [[tuple(px) for px in row] for row in _PNG_ROWS_5x5]


def test_png_decodes_every_filter_type():
    png = _make_png(5, 5, _PNG_ROWS_5x5, filters=[0, 1, 2, 3, 4])
    img = decode_image(png)
    assert (img["width"], img["height"], img["mode"]) == (5, 5, "RGB")
    got = [
        [tuple(img["pixels"][3 * (y * 5 + x) : 3 * (y * 5 + x) + 3]) for x in range(5)]
        for y in range(5)
    ]
    assert got == _PNG_ROWS_5x5


def test_png_multi_idat_and_roundtrip_vs_bmp():
    # same pixels via BMP and via PNG (split across two IDAT chunks) must
    # decode byte-identically
    import struct
    import zlib

    rows = _PNG_ROWS_5x5[:2]
    png = _make_png(5, 2, rows, filters=[4, 4])
    # re-split the single IDAT into two chunks
    sig, rest = png[:8], png[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ihdr_len]
    (idat_len,) = struct.unpack(">I", rest[12 + ihdr_len : 16 + ihdr_len])
    idat_data = rest[20 + ihdr_len : 20 + ihdr_len + idat_len]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    split = sig + ihdr + chunk(b"IDAT", idat_data[:3]) + chunk(
        b"IDAT", idat_data[3:]
    ) + chunk(b"IEND", b"")
    assert decode_image(split)["pixels"] == decode_image(png)["pixels"]
    bmp = _make_bmp(5, 2, rows)
    assert decode_image(bmp)["pixels"] == decode_image(png)["pixels"]


def test_png_bmp_agree_on_larger_image():
    """64x57 deterministic image, PNG filters cycling 0..4 across rows, must
    decode byte-identically to the BMP encoding of the same pixels — pins
    the numpy-vectorized unfilter (Sub prefix-sum, Up add) and the BMP
    reshape/channel-swap against each other at a size where slicing
    mistakes (stride, padding, bottom-up flip) can't hide."""
    w, h = 64, 57
    rows = [
        [tuple((x * 31 + y * 17 + c * 97 + (x * y) % 13) % 256 for c in range(3)) for x in range(w)]
        for y in range(h)
    ]
    filters = [(r % 5) for r in range(h)]
    png = _make_png(w, h, rows, filters=filters)
    bmp = _make_bmp(w, h, rows)
    a, b = decode_image(png), decode_image(bmp)
    assert (a["width"], a["height"]) == (w, h)
    assert a["pixels"] == b["pixels"]
    flat = bytes(c for row in rows for px in row for c in px)
    assert a["pixels"] == flat


def test_png_rejects_malformed():
    import struct
    import zlib

    png = _make_png(
        3, 2, [_PNG_ROWS_5x5[0][:3], _PNG_ROWS_5x5[1][:3]], filters=[0, 2]
    )
    # truncated pixel stream: cut past the 12-byte IEND into the IDAT chunk
    with pytest.raises(ValueError):
        decode_image(png[:-24])
    # interlaced / wrong depth via forged IHDR
    body = bytearray(png)
    body[8 + 8 + 8] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError):
        decode_image(bytes(body))
    # zlib-bomb-ish: geometry larger than _PNG_MAX_PIXELS must refuse before
    # allocating
    ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image(bomb)


def test_png_through_frame_features_no_fallback(spark):
    """A real PNG flows through the mapInPandas pipeline with the fake-decode
    fallback counter at 0 — width/height from the real header, features from
    the real pixel histogram (round-3 VERDICT item 4's 'done' bar)."""
    from hhs_and_cms_data_pipeline_spark.operators.multimodal import (
        _decode_or_fake,
        extract_frame_features,
    )

    png = _make_png(5, 5, _PNG_ROWS_5x5, filters=[0, 1, 2, 3, 4])
    assert _decode_or_fake(png)["decoded"] is True
    bmp = _make_bmp(2, 2, [[(0, 0, 0), (16, 16, 16)], [(32, 32, 32), (255, 255, 255)]])
    assert _decode_or_fake(bmp)["decoded"] is True
    src = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp))], "doc_id long, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in src.mapInPandas(extract_frame_features, FRAME_FEATURE_SCHEMA).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (5, 5)
    assert (out[2]["width"], out[2]["height"]) == (2, 2)


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


def test_png_decoder_roundtrip_property():
    """Property: for ANY pixel content, size, and per-row filter choice,
    encode-with-the-test-writer -> decode must reproduce the exact pixels.
    The test writer applies filters over RAW neighbor bytes per the PNG
    spec, so this pins the numpy-vectorized unfilter (Sub prefix-sum, Up
    wrap-add) and the sequential Average/Paeth paths against an
    independent implementation across random inputs — not just the fixed
    fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        data=st.data(),
    )
    def check(w, h, data):
        rows = [
            [
                tuple(
                    data.draw(st.integers(0, 255), label=f"px{y},{x},{c}")
                    for c in range(3)
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        filters = [data.draw(st.integers(0, 4), label=f"f{y}") for y in range(h)]
        png = _make_png(w, h, rows, filters=filters)
        img = decode_image(png)
        assert (img["width"], img["height"]) == (w, h)
        flat = bytes(c for row in rows for px in row for c in px)
        assert img["pixels"] == flat

    check()


def test_keyframe_worker_matches_model():
    """MM8's mapInPandas worker against a transparent per-byte Python
    model: frame sums, |delta| >= tau selection, frame 0 always kept,
    sub-frame documents dropped."""
    import pandas as pd

    from hhs_and_cms_data_pipeline_spark.operators.multimodal import (
        _KF_FRAME,
        _KF_TAU,
        keyframe_batches,
    )

    import random

    rng = random.Random(6)
    payloads = {
        1: bytes(rng.randrange(256) for _ in range(_KF_FRAME * 5 + 17)),
        2: bytes([7] * (_KF_FRAME - 1)),          # shorter than one frame
        3: bytes([0] * _KF_FRAME)                 # exactly one frame
        + bytes([255] * _KF_FRAME),               # guaranteed scene change
    }
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    out = pd.concat(list(keyframe_batches(iter([pdf]))))
    got = {
        int(r.doc_id): (int(r.n_frames), int(r.n_keyframes), list(r.keyframes))
        for r in out.itertuples()
    }

    want = {}
    for doc_id, data in payloads.items():
        nf = len(data) // _KF_FRAME
        if nf == 0:
            continue  # doc 2 must be absent
        sums = [
            sum(data[f * _KF_FRAME : (f + 1) * _KF_FRAME]) for f in range(nf)
        ]
        kfs = [0] + [
            f for f in range(1, nf) if abs(sums[f] - sums[f - 1]) >= _KF_TAU
        ]
        want[doc_id] = (nf, len(kfs), kfs)
    assert 2 not in got
    assert got == want
    assert got[3][2] == [0, 1], "the 0x00->0xff frame jump must be a keyframe"


def test_pil_hook_widens_decode_when_library_present(monkeypatch):
    """The optional Pillow hook: with the library importable, a payload no
    native parser speaks (e.g. JPEG) decodes through it into the same
    contract dict; with the library absent (this container's reality) the
    documented NotImplementedError -> fake fallback is untouched. A fake
    PIL module stands in for the real one, so both arms run here."""
    import sys
    import types

    import pytest

    from hhs_and_cms_data_pipeline_spark.operators import multimodal as mm

    jpeg_magic = b"\xff\xd8\xff\xe0" + b"x" * 32

    # absent (the container's reality): NotImplementedError as before
    with pytest.raises(NotImplementedError):
        mm.decode_image(jpeg_magic)
    assert mm._decode_or_fake(jpeg_magic)["decoded"] is False

    class _FakeImg:
        width, height = 4, 2

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return bytes(range(4 * 2 * 3))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    out = mm.decode_image(jpeg_magic)
    assert (out["width"], out["height"], out["mode"]) == (4, 2, "RGB")
    assert out["pixels"] == bytes(range(24))
    assert mm._decode_or_fake(jpeg_magic)["decoded"] is True

    # a payload the codec ALSO rejects still raises the native error
    fake_image_mod.open = lambda fp: (_ for _ in ()).throw(OSError("bad"))
    with pytest.raises(NotImplementedError):
        mm.decode_image(jpeg_magic)
