"""Similarity-search invariants across implementations."""

from __future__ import annotations

from hhs_and_cms_data_pipeline_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def test_pandas_udf_topk_matches_builtin_ranks(spark):
    specs = all_specs()
    builtin = specs["sim_topk_bruteforce"].builder(spark, SF_SMOKE).collect()
    arrow = specs["sim_topk_pandas_udf"].builder(spark, SF_SMOKE).collect()
    # arrow variant projects to (rnk, vec_id); ranks must mirror the exact
    # brute-force ordering exactly
    assert [r["vec_id"] for r in builtin] == [r["vec_id"] for r in arrow]
    assert [r["rnk"] for r in arrow] == list(range(1, len(arrow) + 1))


def test_ivf_topk_is_subset_of_bruteforce_order(spark):
    """IVF probes one cell: its results must be correctly ordered and each
    cosine must equal the brute-force cosine for that vec."""
    specs = all_specs()
    brute = {
        r["vec_id"]: r["cosine"]
        for r in specs["sim_topk_bruteforce"].builder(spark, SF_SMOKE).collect()
    }
    ivf = specs["sim_ivf_topk"].builder(spark, SF_SMOKE).collect()
    cosines = [r["cosine"] for r in ivf]
    assert cosines == sorted(cosines, reverse=True)
    for r in ivf:
        if r["vec_id"] in brute:
            assert r["cosine"] == brute[r["vec_id"]]


def test_topk_cosine_separation_guards_rank_oracle():
    """sim_topk_pandas_udf's oracle compares (rnk, vec_id) from BLAS
    pairwise-summed cosines against exact sequential-fold SQL cosines —
    valid ONLY while every adjacent pair of top-k cosines is separated by
    far more than the few-ulp error between the two summation orders. This
    asserts that data-dependent assumption for the SFs the driver tests, so
    a future corpus change fails HERE, loudly, instead of as a flapping
    oracle mismatch. Pure pyarrow/numpy — no Spark session needed."""
    import numpy as np
    import pyarrow.parquet as pq

    from hhs_and_cms_data_pipeline_spark.operators.similarity import (
        _QUERY_VEC_ID,
        _TOP_K,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        q = m[ids == _QUERY_VEC_ID][0]
        mask = ids != _QUERY_VEC_ID
        cos = (m[mask] @ q) / (
            np.sqrt((m[mask] * m[mask]).sum(axis=1)) * np.sqrt(q @ q)
        )
        # top k+1 so a swap across the k-boundary is also covered
        top = np.sort(cos)[::-1][: _TOP_K + 1]
        min_gap = float(np.min(top[:-1] - top[1:]))
        # BLAS-vs-sequential summation error is O(ulp * dim) ~ 1e-13 for
        # unit-ish 64-dim float64 vectors; demand 6 orders of magnitude more
        assert min_gap > 1e-7, (
            f"{sf_dir}: adjacent top-{_TOP_K} cosines separated by only "
            f"{min_gap:.2e} — the (rnk, vec_id) oracle for sim_topk_pandas_udf "
            "is no longer ulp-robust; switch it to a tolerance compare"
        )


def test_partitioned_gemm_matches_builtin_knn(spark):
    """SIM7's partial-top-k GEMM must rank identically to SIM4's exact
    built-in k-NN join on the shared (probe, rank) grid — the merge of
    per-partition top-k lists loses nothing."""
    from hhs_and_cms_data_pipeline_spark.operators.similarity import (
        _GEMM_K,
        sim_knn_join,
        sim_partitioned_knn_gemm,
    )
    from tests.conftest import SF_SMOKE

    gemm = {
        (r["probe_id"], r["rnk"]): r["vec_id"]
        for r in sim_partitioned_knn_gemm(spark, SF_SMOKE).collect()
    }
    exact = {
        (r["probe_id"], r["rnk"]): r["vec_id"]
        for r in sim_knn_join(spark, SF_SMOKE).collect()
        if r["rnk"] <= _GEMM_K
    }
    assert gemm == exact and len(gemm) > 0


def test_lsh_knn_recall_is_nonzero_and_plausible(spark):
    """SIM8's oracle implements the same lossy blocking, so an oracle match
    alone can't prove the buckets ever surface true neighbors (the D6
    round-3 vacuous-pass lesson). Assert real recall against the exact
    k-NN: measured 18% (sf0.001) / 12% (sf0.01) — consistent with theory
    for this RANDOM corpus whose top-5 cosines sit near 0.5 (per-band
    collision ~0.65^8 ~ 3%, 8 bands ~22%); genuine near-duplicates
    (cos >= 0.9) collide at ~94%. The floor guards collapse to zero."""
    from hhs_and_cms_data_pipeline_spark.operators.similarity import (
        sim_knn_join,
        sim_lsh_knn_join,
    )
    from tests.conftest import SF_SMOKE

    lsh = {
        (r["probe_id"], r["vec_id"])
        for r in sim_lsh_knn_join(spark, SF_SMOKE).collect()
    }
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in sim_knn_join(spark, SF_SMOKE).collect()
    }
    assert len(exact) > 0 and len(lsh) > 0
    assert len(lsh & exact) / len(exact) >= 0.05


def test_partitioned_gemm_excludes_self_on_tiny_corpus(spark, tmp_path):
    """Regression: with fewer than k non-self candidates per probe, the old
    -inf self-mask still emitted self-match rows from the local top-k; the
    fix excludes self rows before ranking, so a 4-vector corpus yields
    exactly 3 neighbors per probe and never (probe, probe)."""
    import numpy as np
    import pandas as pd

    from hhs_and_cms_data_pipeline_spark.operators.similarity import (
        sim_partitioned_knn_gemm,
    )

    rng = [[float(((i * 31 + j * 7) % 13) - 6) / 7.0 for j in range(64)] for i in range(4)]
    pd.DataFrame(
        {
            "vec_id": list(range(4)),
            "embedding": [np.asarray(r, dtype=np.float32) for r in rng],
            "label": [0, 1, 0, 1],
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    out = sim_partitioned_knn_gemm(spark, str(tmp_path)).collect()
    assert len(out) == 4 * 3
    assert all(r["probe_id"] != r["vec_id"] for r in out)


def test_pq_build_query_split_consistency(spark):
    """SIM9's build/query split (round-5 VERDICT ask #4): the memoized
    pq_build must (a) hand back the SAME trained frames on a second call
    — the offline-index contract that makes the online ADC query cheap —
    and (b) the code words sim_pq_adc_topk reports per hit must agree row
    for row with sim_pq_build's encoding of those vectors."""
    from hhs_and_cms_data_pipeline_spark.operators.similarity import (
        pq_build,
        sim_pq_adc_topk,
        sim_pq_build,
    )
    from tests.conftest import SF_SMOKE

    cb1, codes1 = pq_build(spark, SF_SMOKE)
    cb2, codes2 = pq_build(spark, SF_SMOKE)
    assert cb1 is cb2 and codes1 is codes2  # memo hit, no retraining

    built = {r["vec_id"]: r for r in sim_pq_build(spark, SF_SMOKE).collect()}
    hits = sim_pq_adc_topk(spark, SF_SMOKE).collect()
    assert len(hits) > 0
    for h in hits:
        b = built[h["vec_id"]]
        assert all(h[f"code_s{s}"] == b[f"code_s{s}"] for s in range(4))
