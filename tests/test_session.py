"""ensure_session_conf error-handling contract: static-conf rejections are
ignorable (the value is fixed for the session's lifetime), everything else
must surface — a typo'd value silently no-op'ing would hide a real misconfig.
"""

from __future__ import annotations

import os

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


def test_registered_query_names_are_stable():
    """Driver-row rotation accumulates correctness coverage ACROSS rounds
    keyed by query NAME — renaming a registered query silently resets its
    history (round-2 VERDICT item 4). Renames must be deliberate: update
    this frozen list in the same commit and say why. Adding queries is
    always fine."""
    from hhs_and_cms_data_pipeline_spark.registry import all_specs

    frozen = {
        "approx_distinct_check", "asof_join_last_purchase",
        "bucketed_colocated_join", "corpus_shard_assignment",
        "corpus_stats_by_lang", "cube_flag_status", "curation_filter_pipeline",
        "decontaminate_ngram_overlap", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_embedding_lsh", "dedup_exact",
        "dedup_levenshtein", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "f11_boolean_parse", "f12_guarded_int_parse",
        "f13_lenient_numeric", "f15_format_number", "f1_wkt_point_parse",
        "f4_date_roundtrip", "f6_sentinel_to_null", "flagship_utilization",
        "ingest_cms_normalize", "ingest_hhs_prep", "j5_multicol_semi_lookup",
        "j6_positional_pairing", "j7_min_id_lookup", "json_extract_props",
        "k1_partitioned_append", "k2_atomic_publish", "k3_upsert_anti_join",
        "mm_binary_meta", "mm_frame_features", "mm_frame_sample", "mm_resize",
        "p1_column_projection", "p4_null_rejection", "p5_membership_filter",
        "p6_range_validity", "pack_sequences", "partition_pruned_scan",
        "percentile_disc_by_flag", "r1_weekly_count_trend",
        "r2_recent_weeks_summary", "r3_utilization_by_rating",
        "r4_weekly_state_totals", "r5_sum_by_state", "r6_bottom10_states",
        "r7_not_reporting", "r8_available_dates", "range_join_price_bands",
        "rollup_flag_status", "s1_csv_scan_schema", "s2_csv_scan_strings",
        "s3_table_scan", "s4_geojson_scan", "s4_json_scan", "salted_skew_join",
        "sample_fixed_k_per_lang", "sample_hash_bernoulli",
        "sample_stratified_frac", "setops_customers_vs_users", "sim_ivf_topk",
        "sim_knn_join", "sim_topk_bruteforce", "sim_topk_pandas_udf",
        "sql_api_scalar_subquery", "stream_sessionize", "stream_sliding_window",
        "stream_stateful_sessionize", "stream_tumbling_hourly",
        "t1_newest_week_row", "t6_topk_by_measure", "text_fingerprint",
        "text_langid", "text_quality_score", "text_regex_tokens",
        "text_repetition_filter", "text_token_stats",
        "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
        "tpch_q1_pricing_summary", "tpch_q22_global_sales_opportunity",
        "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue", "u1_dedup_first_wins",
        "w3_last_value_per_series", "w4_moving_average", "w5_rank_ntile",
    }
    current = set(all_specs())
    missing = frozen - current
    assert not missing, f"registered queries RENAMED or removed: {sorted(missing)}"


# Queries allowed to return ZERO rows at the gate SF, each with the reason.
# Everything else must be non-vacuous: an empty Spark result that hash-matches
# an empty oracle proves nothing (dedup_embedding_lsh shipped three rounds of
# vacuous green before round-3 VERDICT item 1 caught it — this test is the
# guard that would have flagged it in round 1).
_ZERO_ROW_ALLOWLIST: dict[str, str] = {}

_VACUITY_SF = os.environ.get("SPARK_GRAFT_VACUITY_SF", "/root/testdata/sf0.01")


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", sorted(__import__("hhs_and_cms_data_pipeline_spark.registry",
                              fromlist=["all_specs"]).all_specs())
)
def test_registry_non_vacuity(name, spark):
    """Every registered query yields >= 1 row at the driver's gate SF
    (sf0.01), or carries an explicit allowlist entry saying why not."""
    from hhs_and_cms_data_pipeline_spark.registry import all_specs

    if name in _ZERO_ROW_ALLOWLIST:
        pytest.skip(f"zero rows allowed: {_ZERO_ROW_ALLOWLIST[name]}")
    df = all_specs()[name].builder(spark, _VACUITY_SF)
    assert df.limit(1).count() >= 1, (
        f"{name} returned ZERO rows at {_VACUITY_SF} — a zero-row query "
        "hash-matching a zero-row oracle is a vacuous pass; fix the operator "
        "or allowlist it here with a reason"
    )


def test_coverage_inventory_in_sync():
    """COVERAGE.md is the judge-facing operator map; every registered query
    must appear in it (regenerate with scripts/gen_coverage.py), every
    query must carry at least one tag, and no query may be oracle-less."""
    import os

    from hhs_and_cms_data_pipeline_spark.registry import all_specs

    specs = all_specs()
    text = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    ).read()
    missing = [n for n in specs if n not in text]
    untagged = [n for n, s in specs.items() if not s.tags]
    unoracled = [n for n, s in specs.items() if not s.oracle]
    assert not missing, f"regenerate COVERAGE.md: {missing}"
    assert not untagged, f"tag these queries: {untagged}"
    assert not unoracled, f"write oracles for: {unoracled}"
    assert f"**{len(specs)} queries, {len(specs)} oracle-checked" in text


# Queries excused from the 7-way rerun comparison, each with the reason —
# keep this SHORT and justified: an entry here means "this query's OUTPUT is
# by-contract allowed to differ across partitionings", which for a
# deterministic engine should be (near-)never.
_PARTITION_VARIANT_ALLOWLIST: dict[str, str] = {
    "k7_file_manifest": (
        "reports the PHYSICAL layout by contract: part-file names embed the "
        "write job's UUID and the per-partition file count tracks writer "
        "parallelism, so a 7-way rewrite is a different (equally valid) "
        "manifest; row-content fidelity is covered by its oracle diff"
    ),
}


_BENCH_SMOKE = sorted(
    n
    for n, s in __import__(
        "hhs_and_cms_data_pipeline_spark.registry", fromlist=["all_specs"]
    ).all_specs().items()
    if s.bench
)


@pytest.mark.parametrize("name", _BENCH_SMOKE)
def test_partition_count_invariant_headline_smoke(name, spark):
    """Fast-tier smoke slice of the 7-way partition-invariance matrix:
    the headline bench pack (pytest.ini — the full 280-query matrix is
    the slow tier)."""
    _partition_invariance_check(name, spark)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", sorted(__import__("hhs_and_cms_data_pipeline_spark.registry",
                              fromlist=["all_specs"]).all_specs())
)
def test_partition_count_invariant_registry_wide(name, spark):
    """EVERY registered query must produce identical rows under 7-way
    shuffle parallelism (awkward, prime, != default 32): catches any
    accidental dependence on partition boundaries — the partial-top-k
    merge (SIM7), session merging (ST13), window-based dedup (PIPE1), and
    positional sampling (GX3) are exactly the shapes where such bugs hide.
    Registry-wide by construction (round-5 VERDICT ask #5): a new query is
    covered the moment it registers, like the non-vacuity gate above."""
    _partition_invariance_check(name, spark)


def _partition_invariance_check(name, spark):
    from hhs_and_cms_data_pipeline_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    if name in _PARTITION_VARIANT_ALLOWLIST:
        pytest.skip(f"allowed to vary: {_PARTITION_VARIANT_ALLOWLIST[name]}")
    spec = all_specs()[name]

    # repr-keyed sort: total order even with NULL grouping keys (rollup/
    # cube/grouping-sets emit None in key columns, which plain sorted()
    # cannot compare); any deterministic total order works — only equality
    # of the two sorted lists matters.
    # The memoized index builds (PQ codebooks, IVF coarse assignment) are
    # cleared before EVERY run: a cached artifact trained under the
    # baseline partitioning would otherwise be reused by the 7-way rerun,
    # silently exempting the training exchanges from this test.
    def rows(sf: str) -> list[tuple]:
        from hhs_and_cms_data_pipeline_spark.operators import similarity as sim

        sim._PQ_BUILD_CACHE.clear()
        sim._IVF_BUILD_CACHE.clear()
        sim._IVF_INC_CACHE.clear()
        from hhs_and_cms_data_pipeline_spark.operators import graph as _g
        _g._EDGE_CACHE.clear()
        return sorted(map(tuple, spec.builder(spark, sf).collect()), key=repr)

    sf = SF_SMOKE
    baseline = rows(sf)
    if not baseline:
        # a few selective queries (tpch q7/q20) are legitimately empty at
        # sf0.001 — escalate to the gate SF so the comparison is non-vacuous
        sf = _VACUITY_SF
        baseline = rows(sf)
    good = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        skewed = rows(sf)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", good)
    assert skewed == baseline and len(baseline) > 0


def test_concurrent_planning_sees_consistent_confs(spark):
    """ADVICE r7: directed_edges_cached used to flip session-global AQE
    around its artifact build, so anything planned concurrently was
    planned with AQE off. Now the override lives on a cloned session.
    This drives the graph artifact build CONCURRENTLY with other queries
    on the same SparkSession from worker threads and asserts (a) every
    query returns exactly its sequential-run result, and (b) the parent
    session's AQE conf reads 'true' throughout — including while the
    build is in flight."""
    import threading

    from hhs_and_cms_data_pipeline_spark.operators import graph
    from hhs_and_cms_data_pipeline_spark.registry import all_specs
    from tests.conftest import SF_SMOKE

    specs = all_specs()
    names = [
        "graph_pagerank",          # builds/uses the checkpointed artifact
        "tpch_q1_pricing_summary",
        "dedup_exact",
        "r1_weekly_count_trend",
        "sim_topk_bruteforce",
        "xa15_rollup_totals",
    ]
    # force a rebuild so the AQE-off window actually opens during the test
    graph._EDGE_CACHE.clear()
    sequential = {
        n: [tuple(r) for r in specs[n].builder(spark, SF_SMOKE).collect()]
        for n in names
    }
    graph._EDGE_CACHE.clear()

    results: dict[str, list] = {}
    aqe_reads: list[str] = []
    errors: list[BaseException] = []

    def run(name: str) -> None:
        try:
            results[name] = [
                tuple(r) for r in specs[name].builder(spark, SF_SMOKE).collect()
            ]
            aqe_reads.append(spark.conf.get("spark.sql.adaptive.enabled", "true"))
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=run, args=(n,)) for n in names]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert set(results) == set(names)
    for n in names:
        assert results[n] == sequential[n], f"{n} diverged under concurrency"
    assert all(v == "true" for v in aqe_reads), aqe_reads


def test_driver_sample_rotation_self_advances(tmp_path):
    """The registry orders never-driver-sampled names first, extending the
    frozen r1-r9 baseline with whatever CORRECTNESS_r*.json artifacts
    record — so each round's sample file rotates the next unsampled block
    to the front with no manual bookkeeping. Unreadable artifacts degrade
    to the baseline (ordering is best-effort, never correctness)."""
    import json

    from hhs_and_cms_data_pipeline_spark.registry import (
        _DRIVER_SAMPLED_THROUGH_R9,
        _driver_sampled_names,
        all_specs,
    )

    # empty artifact dir -> exactly the frozen baseline
    assert _driver_sampled_names(str(tmp_path)) == _DRIVER_SAMPLED_THROUGH_R9

    # a new round's artifact unions in
    names = list(all_specs())
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names[:50]})
    )
    got = _driver_sampled_names(str(tmp_path))
    assert got == _DRIVER_SAMPLED_THROUGH_R9 | set(names[:50])

    # corrupt artifacts are skipped, valid ones still count
    (tmp_path / "CORRECTNESS_r11.json").write_text("{ not json")
    assert _driver_sampled_names(str(tmp_path)) == got

    # the live ordering puts every never-sampled or modified-since-sampled
    # name before any unmodified sampled one
    from hhs_and_cms_data_pipeline_spark.registry import _modified_since_sampled

    from hhs_and_cms_data_pipeline_spark import registry

    live = _driver_sampled_names()
    modified = _modified_since_sampled(live & set(names))
    # _PINNED_RESAMPLE names are sampled-but-force-promoted (VERDICT r12
    # item 1) and deliberately lead the rotation until a round>=13 artifact
    # re-records them — exclude them from the monotonic-suffix invariant.
    resampled = registry._sampled_at_or_after(registry._PINNED_RESAMPLE_ROUND)
    pins = {n for n in registry._PINNED_RESAMPLE if n not in resampled}
    seen_flags = [
        n in live and n not in modified for n in names if n not in pins
    ]
    assert seen_flags == sorted(seen_flags), (
        "unmodified sampled names must all sort after fresh/modified names"
    )
    # names themselves are the frozen contract; rotation must not lose any
    assert set(names) == set(all_specs())


def test_modified_sampled_query_resurfaces_in_fresh_prefix(tmp_path):
    """A query edited AFTER its green driver sample must re-enter the
    fresh prefix: the rotation sorts sampled names last, so without the
    QUERY_HASHES.json fingerprint compare a regression in an old query
    could hide behind the rotation forever (VERDICT r11 ask #4)."""
    import json

    from hhs_and_cms_data_pipeline_spark import registry

    specs = registry.all_specs()
    sampled = registry._driver_sampled_names() & set(specs)
    victim = sorted(sampled)[0]
    hashes = {n: registry.spec_fingerprint(specs[n]) for n in sampled}
    path = tmp_path / "QUERY_HASHES.json"

    # accurate snapshot: nothing is modified
    path.write_text(json.dumps(hashes))
    assert registry._modified_since_sampled(sampled, str(path)) == set()

    # stale fingerprint for one sampled query: it (and only it) resurfaces
    hashes[victim] = "0" * 32
    path.write_text(json.dumps(hashes))
    assert registry._modified_since_sampled(sampled, str(path)) == {victim}

    # a name the snapshot never recorded is NOT treated as modified (its
    # driver sample postdates every snapshot regeneration)
    del hashes[victim]
    path.write_text(json.dumps(hashes))
    assert registry._modified_since_sampled(sampled, str(path)) == set()

    # missing / corrupt snapshot degrades to no promotion, never an error
    assert registry._modified_since_sampled(sampled, str(tmp_path / "nope")) == set()
    path.write_text("{ not json")
    assert registry._modified_since_sampled(sampled, str(path)) == set()


def test_pinned_fresh_rows_lead_the_rotation():
    """The never-driver-sampled SURVEY §2 scan/sink rows are hand-promoted
    to the head of the sample prefix until an artifact records them
    (VERDICT r11 ask #5). Since r13 the _PINNED_RESAMPLE names (r12-modified
    queries the driver never re-verified, VERDICT r12 item 1) come first."""
    from hhs_and_cms_data_pipeline_spark import registry

    order = list(registry.all_specs())
    sampled = registry._driver_sampled_names()
    resampled = registry._sampled_at_or_after(registry._PINNED_RESAMPLE_ROUND)
    expect_lead = [
        n for n in registry._PINNED_RESAMPLE if n not in resampled
    ] + [n for n in registry._PINNED_FRESH if n not in sampled]
    expect_lead = list(dict.fromkeys(expect_lead))
    assert order[: len(expect_lead)] == expect_lead


def test_r12_modified_queries_sit_in_driver_fresh_prefix():
    """VERDICT r12 item 1: the 11 queries whose plans changed in r12 without
    a driver-side green row must land in the first 50 of all_specs() (the
    driver's sample) until a CORRECTNESS artifact from round >= 13 records
    them — after that the pin expires and rotation resumes."""
    from hhs_and_cms_data_pipeline_spark import registry

    order = list(registry.all_specs())
    resampled = registry._sampled_at_or_after(registry._PINNED_RESAMPLE_ROUND)
    for name in registry._PINNED_RESAMPLE:
        assert name in order, f"{name} left the registry"
        if name not in resampled:
            assert order.index(name) < 50, (
                f"{name} was modified in r12 without driver re-verification "
                f"and must stay inside the fresh-50 prefix until resampled"
            )


def test_helper_edit_promotes_consumer_fingerprint(tmp_path):
    """spec_fingerprint must change when a MODULE-LOCAL HELPER the builder
    calls changes, not just when the builder's own source changes — the r12
    star-loop/cosine_of_pairs/containment rewrites were invisible to the old
    per-builder fingerprint and their consumers never re-verified against
    the driver (VERDICT r12 item 1)."""
    import importlib.util
    import sys

    from hhs_and_cms_data_pipeline_spark import registry

    mod_src_v1 = (
        "def _helper(x):\n"
        "    return x + 1\n"
        "\n"
        "_THRESHOLD = 5\n"
        "\n"
        "def builder(spark, sf_dir):\n"
        "    return _helper(_THRESHOLD)\n"
    )
    # v2 edits ONLY the helper body; v3 edits ONLY the module constant.
    mod_src_v2 = mod_src_v1.replace("return x + 1", "return x + 2")
    mod_src_v3 = mod_src_v1.replace("_THRESHOLD = 5", "_THRESHOLD = 6")

    def fingerprint_of(src: str) -> str:
        p = tmp_path / "fp_probe_mod.py"
        p.write_text(src)
        spec_name = "fp_probe_mod"
        spec = importlib.util.spec_from_file_location(spec_name, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec_name] = mod
        try:
            spec.loader.exec_module(mod)
            import linecache

            linecache.clearcache()  # same path, new contents
            qs = registry.QuerySpec("probe", mod.builder, None)
            return registry.spec_fingerprint(qs)
        finally:
            del sys.modules[spec_name]

    fp1 = fingerprint_of(mod_src_v1)
    fp1_again = fingerprint_of(mod_src_v1)
    fp2 = fingerprint_of(mod_src_v2)
    fp3 = fingerprint_of(mod_src_v3)
    assert fp1 == fp1_again, "fingerprint must be deterministic"
    assert fp1 != fp2, "helper-body edit must change the consumer fingerprint"
    assert fp1 != fp3, "module-constant edit must change the consumer fingerprint"

