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
import re
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
    # Differential symmetry: the ORACLE must refuse the same input (DuckDB
    # error() mirror of the builder guard) — otherwise a long-span series
    # fails the differential by design instead of by divergence.
    con = duckdb_connection(str(d))
    for name in ("xt1_gapfill_locf", "xt3_gapfill_interpolate"):
        with _pytest.raises(Exception, match="spine would exceed"):
            con.execute(SPECS[name].oracle).fetchall()


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


# ---------------------------------------------------------------------------
# Relational/TPC-H adversarial gate: the orders/lineitem/customer consumers
# (TPC-H Q1-Q22, the report pack, joins, windows, sampling, ER blocking,
# graph co-occurrence — ~100 queries) previously ran only on the null-free,
# tie-free generated testdata. This fixture is their adversarial twin:
# NULLs in every column including natural keys, duplicate natural keys,
# same-date ties, exact predicate-boundary dates (1996-01-01 / 1996-04-01 /
# 1996-10-01 / 1997-01-01 and the report CUTOFF 2000-06-01), discounts
# exactly on the 0.05/0.07 BETWEEN edge, a pre-epoch order, orphan foreign
# keys in both directions, a hot customer and a hot order (join skew),
# empty-string and whitespace flags/segments (distinct from NULL), and
# extreme money-grade (0.01-grid) amounts.
#
# The dimension tables (part/supplier/nation/region — round 11, the last
# table family) keep their smoke baselines VERBATIM (so FK targets nation
# 0-24 / part 0-199 / supplier 0-9 stay real) and APPEND the same recipe:
# NULL natural keys, duplicate natural keys with conflicting attributes,
# orphan FKs in the dim->dim direction (supplier->nation, nation->region),
# empty-string and whitespace names/brands/types, extreme money-grade
# balances/prices, negative and zero sizes, and dim rows no fact ever
# references (anti-join survivors).
# ---------------------------------------------------------------------------

_T0 = dt.datetime(1995, 1, 1)


def _ts(y, m, d, h=0):
    return dt.datetime(y, m, d, h)


def _adversarial_customer() -> dict[str, list]:
    cols = {k: [] for k in ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")}
    segs = ["AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE", "MACHINERY"]

    def add(key, name, nat, bal, seg):
        cols["c_custkey"].append(key)
        cols["c_name"].append(name)
        cols["c_nationkey"].append(nat)
        cols["c_acctbal"].append(bal)
        cols["c_mktsegment"].append(seg)

    # baseline: 60 customers over all 25 nations / 5 segments
    for i in range(60):
        add(i, f"Customer#{i:09d}", i % 25, round(i * 7.13 - 150.0, 2), segs[i % 5])
    # NULLs: each nullable column alone, plus an all-null row (null PK)
    add(60, None, 3, 10.0, "BUILDING")
    add(61, "Customer#000000061", None, 10.0, "BUILDING")
    add(62, "Customer#000000062", 4, None, "BUILDING")
    add(63, "Customer#000000063", 5, 10.0, None)
    add(None, None, None, None, None)
    # duplicate natural key (same custkey twice, different attrs)
    add(10, "Customer#000000010-dup", 11, 999.99, "HOUSEHOLD")
    # empty-string / whitespace name and segment (distinct from NULL)
    add(64, "", 6, 1.0, "")
    add(65, " ", 7, 1.0, " ")
    # ER-blocking near-duplicates of customer 1
    add(66, "Customer#000000001", 1, 42.42, "AUTOMOBILE")
    add(67, "customer#000000001", 1, 42.42, "AUTOMOBILE")
    # extreme money-grade balances
    add(68, "Customer#000000068", 8, 1e12, "MACHINERY")
    add(69, "Customer#000000069", 9, -1e12, "MACHINERY")
    add(70, "Customer#000000070", 10, 0.0, "FURNITURE")
    # customers with NO orders (empty groups / anti-join survivors)
    add(71, "Customer#000000071", 12, 5.25, "BUILDING")
    add(72, "Customer#000000072", 13, -5.25, "HOUSEHOLD")
    return cols


def _adversarial_orders() -> dict[str, list]:
    cols = {k: [] for k in (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")}
    stat = ["O", "F", "P"]
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    okey = 0

    def add(cust, status, total, date, priority, key=None):
        nonlocal okey
        cols["o_orderkey"].append(okey if key is None else key)
        cols["o_custkey"].append(cust)
        cols["o_orderstatus"].append(status)
        cols["o_totalprice"].append(total)
        cols["o_orderdate"].append(date)
        cols["o_orderpriority"].append(priority)
        if key is None:
            okey += 1

    # baseline: 180 orders spread over 1995-2001, all statuses/priorities
    for i in range(180):
        add(
            i % 60,
            stat[i % 3],
            round(1000.0 + i * 13.57, 2),
            _T0 + dt.timedelta(days=(i * 13) % 2400, hours=i % 5),
            prio[i % 5],
        )
    # exact predicate-boundary dates (Q4/Q7/Q8/Q14 ranges + report CUTOFF)
    for d in (
        _ts(1996, 1, 1), _ts(1996, 3, 31), _ts(1996, 4, 1), _ts(1996, 9, 30),
        _ts(1996, 10, 1), _ts(1996, 12, 31), _ts(1997, 1, 1), _ts(1997, 12, 31),
        _ts(2000, 5, 31), _ts(2000, 6, 1), _ts(2000, 6, 2),
    ):
        add(1, "O", 500.50, d, "1-URGENT")
    # same-date tie block: 30 orders, one instant, many customers
    for i in range(30):
        add(i % 10, "F", round(10.0 + i, 2), _ts(1999, 7, 5), prio[i % 5])
    # hot customer: #7 floods with 50 orders in one month
    for i in range(50):
        add(7, "O", 77.77, _ts(1998, 3, 1) + dt.timedelta(hours=i), "3-MEDIUM")
    # NULLs: every column alone, plus all-null
    add(None, "O", 10.0, _ts(1999, 1, 1), "5-LOW")          # null custkey
    add(2, None, 10.0, _ts(1999, 1, 2), "5-LOW")            # null status
    add(3, "F", None, _ts(1999, 1, 3), "5-LOW")             # null totalprice
    add(4, "F", 10.0, None, "5-LOW")                        # null orderdate
    add(5, "F", 10.0, _ts(1999, 1, 4), None)                # null priority
    add(None, None, None, None, None)                       # all null attrs
    # null PK order (joins must drop it identically in both engines)
    add(6, "O", 11.0, _ts(1999, 1, 5), "2-HIGH", key=None)
    cols["o_orderkey"][-1] = None
    # duplicate natural key: orderkey 5 appears twice
    add(8, "P", 123.45, _ts(1999, 2, 1), "4-NOT SPECIFIED", key=5)
    # orphan custkey (no such customer): FK-orphan audit fodder
    add(99999, "O", 55.55, _ts(1999, 2, 2), "1-URGENT")
    # pre-epoch order (1969): week/month truncation left of the epoch
    add(9, "F", 9.99, _ts(1969, 12, 29), "5-LOW")
    # extreme money-grade totals
    add(11, "O", 1e12, _ts(1999, 3, 1), "2-HIGH")
    add(12, "O", -1e12, _ts(1999, 3, 2), "2-HIGH")
    add(13, "O", 0.0, _ts(1999, 3, 3), "2-HIGH")
    # empty-string / whitespace status and priority
    add(14, "", 20.0, _ts(1999, 3, 4), "")
    add(15, " ", 20.0, _ts(1999, 3, 5), " ")
    return cols


def _adversarial_lineitem(order_keys: list, order_dates: list) -> dict[str, list]:
    cols = {k: [] for k in (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")}
    rf = ["N", "A", "R"]
    ls = ["O", "F"]

    def add(okey, part, supp, ln, qty, price, disc, tax, flag, status, ship):
        cols["l_orderkey"].append(okey)
        cols["l_partkey"].append(part)
        cols["l_suppkey"].append(supp)
        cols["l_linenumber"].append(ln)
        cols["l_quantity"].append(qty)
        cols["l_extendedprice"].append(price)
        cols["l_discount"].append(disc)
        cols["l_tax"].append(tax)
        cols["l_returnflag"].append(flag)
        cols["l_linestatus"].append(status)
        cols["l_shipdate"].append(ship)

    # baseline: 1-3 lines per real order, shipdate = orderdate + 1-30 days
    j = 0
    for okey, odate in zip(order_keys, order_dates):
        if okey is None or odate is None:
            continue
        for ln in range(1, 1 + (j % 3) + 1):
            j += 1
            add(
                okey, (j * 7) % 200, j % 10, ln,
                float(1 + (j % 50)),
                round(100.0 + (j % 900) * 1.11, 2),
                round((j % 11) * 0.01, 2),        # 0.00-0.10 grid
                round((j % 9) * 0.01, 2),
                rf[j % 3], ls[j % 2],
                odate + dt.timedelta(days=1 + (j % 30)),
            )
    base_order = order_keys[0]
    # discount exactly on the 0.05/0.07 BETWEEN edge (Q6) + shipdate edges
    for d_, ship in (
        (0.05, _ts(1996, 1, 1)), (0.06, _ts(1996, 3, 31)), (0.07, _ts(1996, 4, 1)),
        (0.05, _ts(1996, 12, 31)), (0.07, _ts(1997, 1, 1)),
        (0.04, _ts(1996, 6, 1)), (0.08, _ts(1996, 6, 1)),
        (0.05, _ts(2000, 6, 1)), (0.06, _ts(2000, 6, 2)),
    ):
        add(base_order, 1, 1, 90, 10.0, 1000.0, d_, 0.02, "N", "O", ship)
    # same-microsecond shipdate tie block across flags
    for i in range(12):
        add(order_keys[1], (i * 3) % 200, i % 10, 50 + i, 5.0, 200.0, 0.01,
            0.01, rf[i % 3], ls[i % 2], _ts(1999, 7, 5))
    # hot order: 200 lines on one orderkey (Q18 large-volume + join skew)
    for i in range(200):
        add(order_keys[2], i % 200, i % 10, 100 + i, 3.0,
            round(50.0 + i * 0.25, 2), 0.02, 0.03, "N", "O",
            _ts(1998, 5, 1) + dt.timedelta(minutes=i))
    # NULLs: every column alone, plus an all-null row
    t = _ts(1999, 4, 1)
    add(None, 1, 1, 1, 1.0, 10.0, 0.01, 0.01, "N", "O", t)      # null okey
    add(base_order, None, 1, 2, 1.0, 10.0, 0.01, 0.01, "N", "O", t)
    add(base_order, 1, None, 3, 1.0, 10.0, 0.01, 0.01, "N", "O", t)
    add(base_order, 1, 1, None, 1.0, 10.0, 0.01, 0.01, "N", "O", t)
    add(base_order, 1, 1, 4, None, 10.0, 0.01, 0.01, "N", "O", t)
    add(base_order, 1, 1, 5, 1.0, None, 0.01, 0.01, "N", "O", t)
    add(base_order, 1, 1, 6, 1.0, 10.0, None, 0.01, "N", "O", t)
    add(base_order, 1, 1, 7, 1.0, 10.0, 0.01, None, "N", "O", t)
    add(base_order, 1, 1, 8, 1.0, 10.0, 0.01, 0.01, None, "O", t)
    add(base_order, 1, 1, 9, 1.0, 10.0, 0.01, 0.01, "N", None, t)
    add(base_order, 1, 1, 10, 1.0, 10.0, 0.01, 0.01, "N", "O", None)
    add(None, None, None, None, None, None, None, None, None, None, None)
    # orphan l_orderkey (no such order) and orphan part/supp keys
    add(888888, 1, 1, 1, 2.0, 20.0, 0.02, 0.02, "A", "F", t)
    add(base_order, 7777, 1, 11, 2.0, 20.0, 0.02, 0.02, "A", "F", t)
    add(base_order, 1, 77, 12, 2.0, 20.0, 0.02, 0.02, "A", "F", t)
    # negative and zero quantity/price (returns/corrections on the grid)
    add(order_keys[3], 2, 2, 1, -5.0, -500.0, 0.05, 0.01, "R", "F", t)
    add(order_keys[3], 3, 3, 2, 0.0, 0.0, 0.0, 0.0, "R", "F", t)
    # extreme money-grade price
    add(order_keys[4], 4, 4, 1, 1.0, 1e12, 0.1, 0.08, "N", "O", t)
    add(order_keys[4], 5, 5, 2, 1.0, -1e12, 0.1, 0.08, "N", "O", t)
    # empty-string / whitespace flags (distinct from NULL)
    add(order_keys[5], 6, 6, 1, 1.0, 10.0, 0.01, 0.01, "", "", t)
    add(order_keys[5], 7, 7, 2, 1.0, 10.0, 0.01, 0.01, " ", " ", t)
    return cols


def _append_rows(src_path: str, dst_path: str, extra: dict[str, list]) -> None:
    """Copy a smoke dim table and append adversarial rows, coercing each
    appended column to the smoke file's exact arrow type so the parquet
    schema (and hence both engines' reads) is unchanged."""
    base = pq.read_table(src_path)
    arrays = [
        pa.array(extra[f.name], f.type) for f in base.schema
    ]
    pq.write_table(
        pa.concat_tables([base, pa.table(arrays, schema=base.schema)]),
        dst_path,
    )


def _adversarial_dims(src_sf: str, d) -> None:
    # region: NULL key, duplicate key 1 (conflicting name), empty +
    # whitespace names, a region no nation references (anti-join survivor)
    _append_rows(
        f"{src_sf}/region.parquet",
        str(d / "region.parquet"),
        {
            "r_regionkey": [None, 1, 90, 91, 92],
            "r_name": ["GHOST", "EUROPE-DUP", "", " ", "UNREFERENCED"],
        },
    )
    # nation: NULL key, NULL name, NULL regionkey, duplicate key 3,
    # orphan regionkey (no such region), empty/whitespace names, a nation
    # no customer or supplier references
    _append_rows(
        f"{src_sf}/nation.parquet",
        str(d / "nation.parquet"),
        {
            "n_nationkey": [None, 80, 81, 3, 82, 83, 84, 85],
            "n_name": ["KEYLESS", None, "ORPHANREG", "CANADA-DUP", "", " ",
                       "UNREFERENCED", "NULLREG"],
            "n_regionkey": [0, 1, 77, 2, 3, 4, 0, None],
        },
    )
    # supplier: NULLs in every column (incl. the natural key), duplicate
    # suppkey 2 with conflicting attrs, orphan nationkey, empty/whitespace
    # names, extreme money-grade balances, a supplier with no lineitems
    _append_rows(
        f"{src_sf}/supplier.parquet",
        str(d / "supplier.parquet"),
        {
            "s_suppkey": [None, 70, 71, 72, 2, 73, 74, 75, 76, 77],
            "s_name": ["Supplier#keyless", None, "Supplier#71",
                       "Supplier#72", "Supplier#dup2", "", " ",
                       "Supplier#75", "Supplier#76", "Supplier#nolines"],
            "s_nationkey": [1, 2, None, 99, 3, 4, 5, 6, 7, 8],
            "s_acctbal": [1.0, 2.0, 3.0, 4.0, 5.5, 6.0, 7.0, 1e12, -1e12, None],
        },
    )
    # part: NULLs in every column, duplicate partkey 10 with conflicting
    # attrs, empty/whitespace brand+type+name, extreme retailprice,
    # negative and zero size, a part no lineitem references
    _append_rows(
        f"{src_sf}/part.parquet",
        str(d / "part.parquet"),
        {
            "p_partkey": [None, 500, 501, 502, 503, 504, 10, 505, 506, 507, 508],
            "p_name": ["keyless part", None, "part 501", "part 502",
                       "part 503", "part 504", "dup of ten", "", " ",
                       "extreme part", "unreferenced part"],
            "p_brand": ["Brand#1", "Brand#2", None, "", " ", "Brand#3",
                        "Brand#9", "Brand#4", "Brand#5", "Brand#6", "Brand#7"],
            "p_type": ["STANDARD BRASS", "ECONOMY COPPER", "PROMO STEEL",
                       None, "", " ", "LARGE TIN", "MEDIUM NICKEL",
                       "SMALL BRASS", "PROMO BRASS", "STANDARD TIN"],
            "p_size": [1, 2, 3, 4, None, -5, 0, 6, 7, 8, 9],
            "p_retailprice": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0,
                              None, 0.0, 1e12, -1e12],
        },
    )


@pytest.fixture(scope="module")
def adv_tpch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_tpch_sf")
    for t in TABLES:
        if t not in ("orders", "lineitem", "customer",
                     "part", "supplier", "nation", "region"):
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    _adversarial_dims(SF_SMOKE, d)
    cust = _adversarial_customer()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(cust["c_custkey"], pa.int64()),
                "c_name": pa.array(cust["c_name"], pa.string()),
                "c_nationkey": pa.array(cust["c_nationkey"], pa.int32()),
                "c_acctbal": pa.array(cust["c_acctbal"], pa.float64()),
                "c_mktsegment": pa.array(cust["c_mktsegment"], pa.string()),
            }
        ),
        d / "customer.parquet",
    )
    orders = _adversarial_orders()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(orders["o_orderkey"], pa.int64()),
                "o_custkey": pa.array(orders["o_custkey"], pa.int64()),
                "o_orderstatus": pa.array(orders["o_orderstatus"], pa.string()),
                "o_totalprice": pa.array(orders["o_totalprice"], pa.float64()),
                "o_orderdate": pa.array(orders["o_orderdate"], pa.timestamp("us")),
                "o_orderpriority": pa.array(orders["o_orderpriority"], pa.string()),
            }
        ),
        d / "orders.parquet",
    )
    li = _adversarial_lineitem(orders["o_orderkey"], orders["o_orderdate"])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(li["l_orderkey"], pa.int64()),
                "l_partkey": pa.array(li["l_partkey"], pa.int64()),
                "l_suppkey": pa.array(li["l_suppkey"], pa.int64()),
                "l_linenumber": pa.array(li["l_linenumber"], pa.int32()),
                "l_quantity": pa.array(li["l_quantity"], pa.float64()),
                "l_extendedprice": pa.array(li["l_extendedprice"], pa.float64()),
                "l_discount": pa.array(li["l_discount"], pa.float64()),
                "l_tax": pa.array(li["l_tax"], pa.float64()),
                "l_returnflag": pa.array(li["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(li["l_linestatus"], pa.string()),
                "l_shipdate": pa.array(li["l_shipdate"], pa.timestamp("us")),
            }
        ),
        d / "lineitem.parquet",
    )
    return str(d)


_TPCH_TABLE_RE = re.compile(
    r"\b(orders|lineitem|customer|supplier|part|nation|region)\b"
)
TPCH_QUERIES = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None and _TPCH_TABLE_RE.search(s.oracle.lower())
)


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_adversarial_tpch_differential(name, spark, adv_tpch_dir):
    spec = SPECS[name]
    con = duckdb_connection(adv_tpch_dir)
    compare_spark_duckdb(spec.builder(spark, adv_tpch_dir), con, spec.oracle)


def test_pre_epoch_bucketing_floor_not_truncate(spark, tmp_path):
    """U5/XA21 pre-epoch contract: a 1969 event must land in a real
    calendar cell (dow 0-6, hod 0-23) and in the 10-minute window grid
    aligned across the epoch — exact floor division + positive mod, NOT
    truncating div/% (which both engines would AGREE on while computing a
    nonexistent negative cell, so the main gate can never catch it).
    The standard adversarial events fixture stays post-1970 because the
    XT1/XT3 spine guard refuses multi-decade spans; this fixture runs
    only the two bucketing queries."""
    base = int(dt.datetime(2024, 1, 1).timestamp()) * _US
    rows = {
        # 1969-12-31 23:55:00 UTC = -300s: truncation would bucket win=0
        # (sharing the first POST-epoch window) and dow/hod negative
        "event_id": [1, 2, 3, 4],
        "ts": [-300 * _US, -86_400 * _US - 3 * 3600 * _US, base, base + _US],
        "user_id": [1, 1, 1, 2],
        "event_type": ["view", "click", "view", "click"],
        "value": [1.0, 2.0, 3.0, 4.0],
        "props": ["{}", "{}", "{}", "{}"],
    }
    d = tmp_path / "sf_preepoch"
    d.mkdir()
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
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
    con = duckdb_connection(str(d))
    for name in ("u5_rate_limit_per_key", "xa21_seasonal_profile"):
        spec = SPECS[name]
        compare_spark_duckdb(spec.builder(spark, str(d)), con, spec.oracle)
    # semantic pins beyond engine agreement:
    prof = {(r["dow"], r["hod"]): r["n_events"]
            for r in SPECS["xa21_seasonal_profile"].builder(spark, str(d)).collect()}
    assert all(0 <= dw <= 6 and 0 <= h <= 23 for dw, h in prof)
    # 1969-12-31 was a WEDNESDAY (dow 3 with 0=Sunday), 23:55 UTC -> hod 23
    assert prof.get((3, 23)) == 1
    # 1969-12-30 21:00 UTC was a TUESDAY (dow 2), hod 21
    assert prof.get((2, 21)) == 1
    wins = {r["event_id"]: r["win"]
            for r in SPECS["u5_rate_limit_per_key"].builder(spark, str(d)).collect()}
    # floor: -300s is in window -1 (the LAST pre-epoch 10-min bucket),
    # never window 0 (truncation's answer)
    assert wins[1] == -1


def test_mips_recall_null_on_degenerate_corpus(spark, tmp_path):
    """SIM23 degenerate-corpus contract: with no non-query vectors the
    exact top-k is empty (n_exact = 0) and recall must be NULL on BOTH
    engines — Spark's raw double 0/0 would be NaN while DuckDB's is NULL,
    the divergence class the F.when/NULLIF guard exists for."""
    d = tmp_path / "sf_onlyq"
    d.mkdir()
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array(
                    [[1.0] + [0.0] * 15], pa.list_(pa.float32())
                ),
                "label": pa.array([1], pa.int64()),
            }
        ),
        d / "embeddings.parquet",
    )
    spec = SPECS["sim_mips_recall_report"]
    rows = spec.builder(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_exact"], r["n_hit"]) == (0, 0)
    assert r["recall"] is None, f"recall must be NULL, got {r['recall']!r}"
    con = duckdb_connection(str(d))
    compare_spark_duckdb(spec.builder(spark, str(d)), con, spec.oracle)
