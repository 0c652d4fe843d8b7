"""Paired A/B: co-bucketed join vs plain-parquet shuffle join.

Builds the same two tables twice (bucketed external tables vs plain
parquet), then times the doc_id equi-join + a bucket-key groupBy in
the SAME session, back to back, and reports the Exchange counts. The
claim under test (pipeline/bucketed.py): the bucketed layout amortizes
the repeated join shuffle into the write — read-side joins plan zero
Exchange.

Usage: python tools/bench_bucketed.py [n_rows] [n_buckets]
Prints one JSON line. Run alone (no concurrent Spark JVMs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from imitation_learning_data_pipeline_spark.pipeline.bucketed import (
        bucket_write,
        cobucket_join,
        exchange_count,
    )
    from imitation_learning_data_pipeline_spark.session import get_spark

    base = tempfile.mkdtemp(prefix="bucketed_ab_")
    spark = get_spark("bench-bucketed")
    res: dict = {"n_rows": n_rows, "n_buckets": n_buckets}

    def _timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    try:
        left = spark.range(n_rows).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            (F.col("id") % 1000).alias("grp"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(n_rows).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            (F.col("id") % 7).cast("double").alias("score"),
        )
        paths = {k: os.path.join(base, k) for k in ("lb", "rb", "lp", "rp")}
        t0 = time.perf_counter()
        bucket_write(left, "bb_left", "doc_id", n_buckets, paths["lb"])
        bucket_write(right, "bb_right", "doc_id", n_buckets, paths["rb"])
        res["bucketed_write_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        left.write.parquet(paths["lp"])
        right.write.parquet(paths["rp"])
        res["plain_write_s"] = round(time.perf_counter() - t0, 3)

        # big⋈big is the case bucketing exists for: at 100 TB neither
        # side broadcasts, so force shuffle joins to make the local A/B
        # representative (otherwise AQE broadcasts the 8M-row side here
        # and measures a join shape that cannot exist at scale)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        jb = cobucket_join(spark, "bb_left", "bb_right", on="doc_id")
        jp = spark.read.parquet(paths["lp"]).join(
            spark.read.parquet(paths["rp"]), "doc_id"
        )
        # warm the page cache on both, then time two repeats each
        res["bucketed_join_s"] = min(_timed(jb), _timed(jb))
        res["plain_join_s"] = min(_timed(jp), _timed(jp))
        res["bucketed_join_exchanges"] = exchange_count(jb, execute=True)
        res["plain_join_exchanges"] = exchange_count(jp, execute=True)

        gb = (
            spark.table("bb_left")
            .groupBy("doc_id")
            .agg(F.sum("grp").alias("s"))
        )
        gp = (
            spark.read.parquet(paths["lp"])
            .groupBy("doc_id")
            .agg(F.sum("grp").alias("s"))
        )
        res["bucketed_groupby_s"] = min(_timed(gb), _timed(gb))
        res["plain_groupby_s"] = min(_timed(gp), _timed(gp))
        res["bucketed_groupby_exchanges"] = exchange_count(gb, execute=True)
        res["plain_groupby_exchanges"] = exchange_count(gp, execute=True)
        print(json.dumps(res))
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_left")
        spark.sql("DROP TABLE IF EXISTS bb_right")
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
