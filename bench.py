"""Benchmark harness (driver-run per round; also the local feedback loop).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the noop sink (full materialization of every
operator — a bare .count() would let Catalyst prune unevaluated columns
and under-report).

Usage: python bench.py [--sf-dir DIR] [--queries a,b,c] [--repeat N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "join_star_region_revenue",
    "flagship_user_activity",
    "window_reindex",
    "window_sessionize",
    "agg_weighted_variance",
    "vector_zscore",
    "scalar_hash_split",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "text_langid",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "pipeline_discover_status",
    "pipeline_align_events",
    "multimodal_decode_stub",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from imitation_learning_data_pipeline_spark.plans import QUERIES
    from imitation_learning_data_pipeline_spark.session import get_spark

    def fresh_session():
        s = get_spark("bench")
        # Warm the JVM/session so per-query timings measure the queries.
        s.range(1000).selectExpr("sum(id)").collect()
        return s

    spark = fresh_session()
    names = args.queries.split(",") if args.queries else HEADLINE
    timings: dict[str, float] = {}
    for i, name in enumerate(names):
        # Session recycling (JMH-fork style): long local[32] sessions
        # accumulate state (python workers, broadcast/GC debt) that was
        # measured to inflate late queries 3-10× vs the same query in a
        # fresh session. A restart every few queries keeps timings honest
        # at ~8 s amortized overhead (not counted against any query).
        if i > 0 and i % 6 == 0:
            spark.stop()
            spark = fresh_session()
        fn = QUERIES[name]
        best = None
        for _ in range(args.repeat):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        # Drop relations persisted inside query plans (minhash/ngram keep
        # their shingle tables cached).
        spark.catalog.clearCache()

    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
