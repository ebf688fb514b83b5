#!/usr/bin/env python
"""Benchmark harness (driver contract, see repo instructions).

Runs the headline queries (QuerySpec.bench=True) at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hhs_and_cms_data_pipeline_spark.registry import all_specs  # noqa: E402
from hhs_and_cms_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("WARN")

    all_ = all_specs()
    specs = {n: s for n, s in all_.items() if s.bench}

    # Non-gating representatives of the families the headline pack never
    # touches (TPC-H-heavy, streaming, curation, multimodal): timed and
    # reported under "extended" so regressions there are visible round-over-
    # round, but EXCLUDED from the headline metric — the BASELINE comparison
    # depends on the 11-query pack staying stable.
    extended_names = [
        "tpch_q9_product_profit",
        "stream_interval_join",
        "decontaminate_ngram_overlap",
        "mm_audio_energy",
        "mm_frame_features",
        "dedup_substring_spans",
        "sim_partitioned_knn_gemm",
        "curation_end_to_end",
        "graph_pagerank",
        "sim_pq_build",
        "sim_pq_adc_topk",
        "gx3_theil_sen_trend",
        "dedup_cdc_chunks",
        "dedup_semantic_prune",
        "text_bigram_lm_surprisal",
        "sk_histogram_median",
        "stream_hll_registers",
        "graph_label_propagation",
        "sk_bloom_filter",
        "stream_drift_monitor",
        "sim_ivf_incremental_add",
        "retrieval_hard_negatives",
        "sk_hll_rollup",
        "stream_cms_heavy_hitters",
        "graph_triangle_counts",
        "curation_dsir_select",
        "text_bm25_topk",
        "text_inverted_index",
        "text_phrase_search",
        "text_index_incremental",
        "s12_xml_scan",
        "k10_manifest_sink_roundtrip",
        "stream_manifest_sink",
        "dedup_containment",
        "sk_ams_f2",
        "mm_vad_segments",
        "stream_timer_sessions",
        "xt3_gapfill_interpolate",
        # round-8 additions
        "curation_hashed_linear_score",
        "curation_semantic_decontaminate",
        "text_proximity_search",
        "xa15_rollup_totals",
        "sim_radius_search",
        "u4_debounce_dedup",
        # round-9 addition: was excluded at ~33s; the packed-key cn-filtered
        # top-k plan runs at the measured wedge-EXCHANGE floor (~16s at
        # sf0.1 — exact common-neighbor counting is Theta(sum deg^2) = 148M
        # wedges on this dense graph, and a bare repartition of those keys
        # already costs 11-14s on this VM). Honest cost, no silent cap.
        "graph_link_prediction",
        # graph_ra_link_prediction is intentionally NOT here: same full
        # wedge aggregation (the cn-filter shortcut is unsound for RA
        # ordering), so it pays the same ~16s floor graph_link_prediction
        # already represents in this pack; its correctness is gated at
        # sf0.01 like everything else.
        "xa16_markov_transitions",
        "xa17_rfm_segments",
        "xa18_cumulative_active_users",
        "xt5_ohlc_daily",
        "tx16_pmi_collocations",
        "tx17_chunk_spans",
        "k11_compaction_plan",
        "sim_ndcg_report",
        "xa19_activity_streaks",
        "xa20_event_concentration",
        # this session's additions
        "xt6_ewma_trend",
        "u5_rate_limit_per_key",
        "sim_mips_ivf_topk",
        "k12_scd2_user_state",
        # round-12 additions
        "graph_wcc_sizes",
        "retrieval_hybrid_rrf",
    ]
    missing = [n for n in extended_names if n not in all_]
    if missing:
        raise KeyError(
            f"extended bench names not in registry (renamed?): {missing}"
        )
    extended_specs = {n: all_[n] for n in extended_names}

    def timed_pack(pack: dict, include_builder: bool = False) -> dict[str, float]:
        # Warm EVERY query once (JVM/codegen/parquet-footer caches), then
        # take the per-query BEST of two timed runs. Warm-first keeps
        # round-over-round deltas tracking plan changes, not session
        # warm-up (round-2 numbers were noisy enough to mask regressions);
        # best-of-two additionally shields the headline number from this
        # VM's transient CPU-steal windows (observed 4x inflation of an
        # unchanged query pack within a single session).
        for name in sorted(pack):
            pack[name].builder(spark, sf_dir).collect()
        out: dict[str, float] = {}
        for _ in range(2):
            for name in sorted(pack):
                # include_builder puts builder() INSIDE the window: the
                # sink/staging ops (K10, ST22, the stream_* drains) do
                # their real work eagerly in the builder, so timing only
                # the read-back .collect() would hide regressions in the
                # actual write/commit path. The HEADLINE pack stays
                # collect-only — its recorded BASELINE was measured that
                # way, and py4j plan construction (not execution) would
                # otherwise roughly double every pure query's number and
                # break round-over-round comparability.
                if include_builder:
                    t0 = time.perf_counter()
                    pack[name].builder(spark, sf_dir).collect()
                else:
                    df = pack[name].builder(spark, sf_dir)
                    t0 = time.perf_counter()
                    df.collect()
                dt = round(time.perf_counter() - t0, 4)
                out[name] = min(out.get(name, dt), dt)
        return out

    timings = timed_pack(specs)
    extended = timed_pack(extended_specs, include_builder=True)

    total = round(sum(timings.values()), 4)
    line = json.dumps(
        {
            "metric": "headline_query_pack_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "extended": extended,
            "sf": sf,
        }
    )
    print(line)
    # Self-record: the driver captures stdout with a tail that has truncated
    # mid-JSON before (BENCH_r09.json lost its `value` field), so append the
    # full line to a repo-local log where the number survives regardless.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.jsonl"), "a") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # bench output on stdout is still the contract
    # Truncation-proof trailer: the driver's stdout capture keeps the TAIL,
    # and the big JSON line has been cut mid-line before (BENCH_r09/r11 lost
    # the `value` field). A short final line AFTER the JSON guarantees any
    # tail capture contains the one number that matters.
    print(f"HEADLINE_SECONDS {total}")
    spark.stop()


if __name__ == "__main__":
    main()
