"""Adversarial differential gate: every event-consuming query's Spark
builder vs its DuckDB oracle over a synthetic events table built from the
edge cases the driver's testdata never contains — NULLs in every nullable
column, same-microsecond ties across event types, exact window-boundary
timestamps, pre-epoch rows, hot keys, empty-string types, extreme values.

Motivation: the XJ4 forward-scan tie bug survived three scale factors of
the standard gate because the generated testdata has no same-microsecond
purchase/error pair; this module makes that whole class of divergence
(documented tie-breaks, null filters, boundary bucketing, sign handling)
fail in CI instead of on a driver sample. Values stay on the 0.01 grid —
the engine's money-grade decimal contract — so every mismatch this gate
reports is a REAL in-contract divergence, not quantization noise.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hhs_and_cms_data_pipeline_spark.registry import all_specs
from hhs_and_cms_data_pipeline_spark.sources.tables import TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_spark_duckdb, duckdb_connection

_US = 1_000_000


def _adversarial_events() -> list[dict]:
    rows: list[dict] = []
    eid = 0

    def add(ts_us, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": None if ts_us is None else ts_us,
                "user_id": user,
                "event_type": etype,
                "value": value,
                "props": props,
            }
        )
        eid += 1

    base = int(dt.datetime(2024, 1, 1).timestamp()) * _US
    types = ["purchase", "error", "view", "signup", "click"]
    # baseline traffic: 3 days, 6 users, deterministic spread
    for i in range(400):
        add(
            base + i * 11 * 60 * _US + (i % 7) * _US,
            i % 6,
            types[i % 5],
            round((i % 50) * 0.25 - 3.0, 2),
        )
    # NULL blocks: every nullable column, alone and together
    for i in range(10):
        add(None, 1, "view", 1.0)                    # null ts
        add(base + i * _US, None, "view", 1.0)       # null user
        add(base + i * _US, 2, None, 1.0)            # null type
        add(base + i * _US, 3, "click", None)        # null value
        add(base + i * _US, 4, "click", 2.0, None)   # null props
        add(None, None, None, None, None)            # all null
    # same-microsecond ties: purchase AND error at one instant (the XJ4
    # trap), plus multi-type bursts at a shared timestamp
    for u in (0, 1, 2):
        t0 = base + 3600 * _US * (u + 1)
        add(t0, u, "purchase", 10.0)
        add(t0, u, "error", 11.0)
        add(t0, u, "purchase", 12.0)  # duplicate same-ts purchase
        add(t0, u, "view", 13.0)
        add(t0 + 50 * 60 * _US, u, "error", 14.0)  # later error, prev tie
    # exact bucket boundaries: hour, 10-minute, day
    for k, u in ((24, 3), (25, 4)):
        add(k * 3600 * _US + base - base % (3600 * _US), u, "view", 1.5)
        add(base + k * 600 * _US - base % (600 * _US), u, "click", 2.5)
    add(base - base % (86400 * _US), 5, "signup", 0.0)
    # pre-REFERENCE rows with sub-minute/sub-second offsets: the trend
    # operators measure x relative to 2024-01-01, so 2023-12-31 rows make
    # x negative and non-aligned — the exact case where date_diff's
    # boundary count diverges from floor (the XA9/GX3 finding). Kept
    # within a day of the corpus so XT1/XT3's dense hourly spine stays
    # small (a 1969 row would inflate it ~500x, which the spine guard now
    # refuses — covered by its own test below).
    add(base - 90_001 * _US, 5, "view", -1.25)      # -1500min 1s
    add(base - 1, 5, "error", -0.5)                 # -1us
    add(base - 59 * _US - 500_000, 5, "purchase", 2.25)  # -59.5s
    # hot key: one user flooding a single 10-minute window
    t_hot = base + 40 * 3600 * _US
    for i in range(300):
        add(t_hot + i * 1000, 7, "click", 0.75)
    # empty-string and whitespace event types (distinct from NULL)
    for i in range(5):
        add(base + (100 + i) * 60 * _US, 8, "", 1.0)
        add(base + (200 + i) * 60 * _US, 8, " ", 1.0)
    # extreme (but money-grade) values
    add(base + 500 * 60 * _US, 9, "purchase", 1e12)
    add(base + 501 * 60 * _US, 9, "purchase", -1e12)
    add(base + 502 * 60 * _US, 9, "purchase", 0.0)
    return rows


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    rows = _adversarial_events()
    tbl = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


SPECS = all_specs()
EVENT_QUERIES = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None and "events" in s.oracle.lower()
)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_differential(name, spark, adv_dir):
    spec = SPECS[name]
    con = duckdb_connection(adv_dir)
    compare_spark_duckdb(spec.builder(spark, adv_dir), con, spec.oracle)


def test_gapfill_spine_guard_refuses_decade_outlier(spark, tmp_path):
    """XT1/XT3 scale guard: one 1970-default corrupt timestamp must make
    the dense-spine gapfills FAIL LOUDLY instead of silently inflating the
    hourly series by decades (the adversarial fixture deliberately keeps
    its timestamps within days so the differential runs; this pins the
    refusal path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    d = tmp_path / "sf_outlier"
    d.mkdir()
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    base = int(dt.datetime(2024, 1, 1).timestamp()) * _US
    rows = {
        "event_id": [1, 2, 3],
        "ts": [0, base, base + 3600 * _US],  # 1970 corrupt + 2024 rows
        "user_id": [1, 1, 2],
        "event_type": ["view", "view", "click"],
        "value": [1.0, 2.0, 3.0],
        "props": ["{}", "{}", "{}"],
    }
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "value": pa.array(rows["value"], pa.float64()),
                "props": pa.array(rows["props"], pa.string()),
            }
        ),
        d / "events.parquet",
    )
    for name in ("xt1_gapfill_locf", "xt3_gapfill_interpolate"):
        with _pytest.raises(Exception, match="spine would span"):
            SPECS[name].builder(spark, str(d)).collect()


# ---------------------------------------------------------------------------
# Documents-table adversarial gate: same idea over the text/dedup/curation
# surface. Fixture contract notes: doc_id unique; n_chars == len(text)
# (derived-column invariant the generator upholds); text/lang/source may be
# empty strings; lang/source may be NULL. NULL text is excluded BY CONTRACT
# — the corpus loader guarantees a string body (the reference's corpus
# does) — so the gate exercises degenerate strings, not absent ones.
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa"]


def _adversarial_documents() -> list[dict]:
    rows: list[dict] = []

    def add(text, lang="en", source="srcA"):
        rows.append(
            {
                "doc_id": len(rows),
                "text": text,
                "lang": lang,
                "source": source,
                "n_chars": len(text),
            }
        )

    # baseline corpus: varied multi-token docs, deterministic
    for i in range(60):
        toks = [_WORDS[(i * 7 + j) % 10] for j in range(8 + i % 9)]
        add(" ".join(toks), lang=["en", "es", "fr"][i % 3],
            source=f"src{i % 4}")
    # exact duplicates and near-duplicates (one token changed)
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    add(dup); add(dup); add(dup.replace("zeta", "iota"))
    # empty and whitespace-only bodies
    add(""); add(" "); add("   ")
    # single-token and single-char docs
    add("alpha"); add("x")
    # all-one-token repetition (repetition filters, Zipf, BPE)
    add("spam " * 49 + "spam")
    # unicode: accents, CJK, emoji, combining marks
    add("café naïve résumé über")
    add("数据 管道 引擎")
    add("rocket \U0001F680 launch \U0001F680")
    # punctuation-only and mixed-symbol bodies
    add("!!! ??? ;;; :::"); add("a,b.c;d:e")
    # very long single token (token-length stats, BPE)
    add("x" * 500)
    # doubled spaces => empty-string tokens inside the split
    add("alpha  beta   gamma")
    # NULL / empty metadata
    add("plain body with null lang", lang=None)
    add("plain body with null source", source=None)
    add("plain body with empty lang", lang="")
    return rows


@pytest.fixture(scope="module")
def adv_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_docs_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    rows = _adversarial_documents()
    tbl = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


DOC_QUERIES = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None
    and "documents" in s.oracle.lower()
    and "events" not in s.oracle.lower()
)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_documents_differential(name, spark, adv_docs_dir):
    spec = SPECS[name]
    con = duckdb_connection(adv_docs_dir)
    compare_spark_duckdb(spec.builder(spark, adv_docs_dir), con, spec.oracle)


# ---------------------------------------------------------------------------
# Embeddings-table adversarial gate: the similarity / vector-dedup surface
# over the corpora ANN code breaks on — zero vectors (norm 0: cosine is a
# division by zero), an identical-vector cluster, huge (1e15) and tiny
# (1e-15) magnitudes, negatives, axis-aligned one-hot vectors, and a NULL
# label (an "unlabeled" IVF cell). Fixed dim (64) and non-null embeddings
# are source contracts (a real embedding pipeline emits fixed-width
# float32); vec_id 0 stays a normal standing query vector.
# ---------------------------------------------------------------------------

_DIM = 64


def _vec(seed: int, scale: float = 1.0) -> list[float]:
    # deterministic float32-exact components on the 1/64 grid
    import struct

    out = []
    for i in range(_DIM):
        v = (((seed * 31 + i * 17) % 129) - 64) / 64.0 * scale
        out.append(struct.unpack("f", struct.pack("f", v))[0])
    return out


def _adversarial_embeddings() -> list[dict]:
    rows: list[dict] = []

    def add(vec, label):
        rows.append({"vec_id": len(rows), "embedding": vec, "label": label})

    add(_vec(1), 3)  # vec_id 0: the standing query — normal
    for i in range(1, 80):
        add(_vec(i + 1), i % 10)
    # zero vector: norm 0 — cosine paths must not crash or diverge
    add([0.0] * _DIM, 4)
    # identical-vector cluster (cosine exactly 1, dedup cluster)
    twin = _vec(7)
    for _ in range(4):
        add(twin, 7)
    # the query vector duplicated under another id (cosine 1 with q)
    add(_vec(1), 2)
    # large and tiny magnitudes. 1e5 is near the DOCUMENTED ceiling of the
    # decimal-exact distance route: dim-64 squared distances must fit
    # DECIMAL(38,24) (integer part 1e14), so |component| <~ 1e6; beyond
    # that the engine fails LOUDLY (NUMERIC_VALUE_OUT_OF_RANGE) instead of
    # silently losing precision — pinned by its own test below.
    add(_vec(11, scale=1e5), 5)
    add(_vec(13, scale=1e-15), 6)
    # negated copy of the query (cosine exactly -1)
    add([-x for x in _vec(1)], 8)
    # axis-aligned one-hots
    for k in (0, 1, _DIM - 1):
        v = [0.0] * _DIM
        v[k] = 1.0
        add(v, 9)
    # a NULL-label (unlabeled) vector — an IVF cell of its own
    add(_vec(42), None)
    return rows


@pytest.fixture(scope="module")
def adv_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_emb_sf")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    rows = _adversarial_embeddings()
    tbl = pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r["embedding"] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r["label"] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


EMB_QUERIES = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None and "embeddings" in s.oracle.lower()
)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_differential(name, spark, adv_emb_dir):
    spec = SPECS[name]
    con = duckdb_connection(adv_emb_dir)
    compare_spark_duckdb(spec.builder(spark, adv_emb_dir), con, spec.oracle)


def test_extreme_magnitude_fails_loudly(spark, tmp_path):
    """The decimal-exact similarity route (DECIMAL(38,24) distance sums)
    cannot represent squared distances of ~1e15-magnitude vectors. The
    contract is a LOUD failure (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE),
    never silent precision loss — embedding pipelines normalize or bound
    magnitudes at ingest."""
    import pytest as _pytest

    d = tmp_path / "sf_mag"
    d.mkdir()
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    vecs = [_vec(1), _vec(2, scale=1e15), _vec(3)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([1, 2, 3], pa.int64()),
            }
        ),
        d / "embeddings.parquet",
    )
    with _pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        SPECS["sim_ivf_topk"].builder(spark, str(d)).collect()
