#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

Two modes, one shared session:

  plans [--suffix before|after] [name ...]
      Build each query and write .explain("formatted") to
      plans/r12/<name>_<suffix>.txt.  Default name set: the bench
      headline + extended packs (the queries the driver times).

  time [--reps N] name [name ...]
      Isolate queries with the noop sink (df.write.format("noop")) so the
      computation is timed, not the collect/sink; one warm pass then
      best-of-N.  Jobs are labelled via setJobDescription.

Streaming/sink queries (stream_*, k10_*) do their real work eagerly in
the builder; for those the builder call is placed INSIDE the timed
window (same rationale as bench.py's include_builder) and the plan file
records the read-back plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhs_and_cms_data_pipeline_spark.registry import all_specs  # noqa: E402
from hhs_and_cms_data_pipeline_spark.session import get_spark  # noqa: E402

# Builders that execute their real work eagerly inside builder().
EAGER_PREFIXES = ("stream_", "k10_", "k11_", "k12_")


def bench_names(all_) -> list[str]:
    """Headline pack + bench.py's extended list. The extended list lives
    inside bench.main() (bench.py is frozen — the driver diffs it byte-wise),
    so extract the list literal from the AST rather than string-splitting
    source text (ADVICE r12: the split-based version broke on reformats and
    over-matched names in comments)."""
    import ast
    import bench

    headline = sorted(n for n, s in all_.items() if s.bench)
    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    extended: list[str] = []
    for node in ast.walk(ast.parse(src)):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "extended_names"
                for t in node.targets
            )
            and isinstance(node.value, ast.List)
        ):
            extended = [
                e.value
                for e in node.value.elts
                if isinstance(e, ast.Constant) and isinstance(e.value, str)
            ]
            break
    if not extended:
        raise RuntimeError("extended_names list not found in bench.py")
    return list(dict.fromkeys(headline + extended))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["plans", "time"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--round", dest="round_dir", default="r13",
                    help="plans/<round>/ output subdir for plans mode")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--eager", action="store_true",
        help="time mode: put builder() inside the timed window for every "
             "named query (for builders that do eager work — iterative "
             "loops, exactness gates — not just the stream_/k1* sinks)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    all_ = all_specs()
    names = args.names or bench_names(all_)
    bad = [n for n in names if n not in all_]
    if bad:
        raise KeyError(f"unknown queries: {bad}")

    if args.mode == "plans":
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", args.round_dir,
        )
        os.makedirs(out_dir, exist_ok=True)
        for n in names:
            df = all_[n].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(out_dir, f"{n}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
            print(f"{n}: {plan.count('Exchange')} Exchange, "
                  f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')} py-nodes")
        return 0

    # mode == time: noop-sink isolation, warm + best-of-N
    for n in names:
        eager = args.eager or n.startswith(EAGER_PREFIXES)
        spark.sparkContext.setJobDescription(f"warm:{n}")
        all_[n].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"time:{n}:{r}")
            if eager:
                t0 = time.perf_counter()
                all_[n].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                df = all_[n].builder(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{n}\t{best:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
