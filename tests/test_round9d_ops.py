"""Round-9 bucketed tables (pipeline/bucketed.py): exchange-free
co-bucketed joins, one-file-per-bucket layout, sorted-bucket merge
joins, external-table semantics, and the CLI/MOR interplay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.pipeline.bucketed import (
    bucket_write,
    cobucket_join,
    exchange_count,
    read_bucketed,
)

N = 20_000
NB = 8


class _no_broadcast:
    """Force shuffle joins so the Exchange comparison is honest — at
    real scale both join sides exceed any broadcast threshold."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


@pytest.fixture()
def pair(spark, tmp_path):
    """Two co-bucketed tables sharing key doc_id, written from
    many-partition upstreams (the sprawl case bucket_write guards)."""
    left = spark.range(N).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 100).alias("grp"),
    )
    right = spark.range(0, N, 2).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") * 2).alias("score"),
    )
    lp, rp = str(tmp_path / "left"), str(tmp_path / "right")
    r1 = bucket_write(left.repartition(16), "t9d_left", "doc_id", NB, lp)
    r2 = bucket_write(right.repartition(16), "t9d_right", "doc_id", NB, rp)
    yield ("t9d_left", "t9d_right", lp, rp, r1, r2)
    spark.sql("DROP TABLE IF EXISTS t9d_left")
    spark.sql("DROP TABLE IF EXISTS t9d_right")


class TestBucketedJoin:
    def test_cobucketed_join_has_zero_exchanges(self, spark, pair):
        ln, rn, *_ = pair
        with _no_broadcast(spark):
            j = cobucket_join(spark, ln, rn, on="doc_id")
            assert exchange_count(j, execute=True) == 0
            assert j.count() == N // 2

    def test_unbucketed_baseline_shuffles(self, spark, pair):
        # the same join through plain parquet reads plans Exchanges —
        # proving the elision comes from the bucket spec, not the data
        _ln, _rn, lp, rp, *_ = pair
        with _no_broadcast(spark):
            j = spark.read.parquet(lp).join(
                spark.read.parquet(rp), on="doc_id"
            )
            assert exchange_count(j, execute=True) >= 2
            assert j.count() == N // 2

    def test_join_results_match_plain(self, spark, pair):
        ln, rn, lp, rp, *_ = pair
        a = cobucket_join(spark, ln, rn, on="doc_id")
        b = spark.read.parquet(lp).join(spark.read.parquet(rp), "doc_id")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_groupby_on_bucket_key_no_exchange(self, spark, pair):
        ln, *_ = pair
        g = read_bucketed(spark, ln).groupBy("doc_id").agg(
            F.sum("grp").alias("s")
        )
        assert exchange_count(g, execute=True) == 0


class TestBucketedDmlGuard:
    """Repo DML against a bucketed table's path would rewrite or append
    files that no longer honor hash(key) pmod N while the catalog still
    plans exchange-free joins trusting it — silent wrong results. Every
    rewriting/appending op must refuse."""

    def test_all_dml_refuses(self, spark, pair):
        from imitation_learning_data_pipeline_spark.pipeline.bucketed import (
            BucketedTableError,
        )
        from imitation_learning_data_pipeline_spark.pipeline.compact import (
            compact,
        )
        from imitation_learning_data_pipeline_spark.pipeline.deletes import (
            delete_from_mor,
            delete_keys_mor,
            purge_deletes,
        )
        from imitation_learning_data_pipeline_spark.pipeline.merge import (
            cluster_write,
            delete_from,
            insert_into,
            merge_into,
            update_where,
        )

        lp = pair[2]
        ups = spark.createDataFrame(
            [("doc-1", 5)], "doc_id string, grp long"
        )
        with pytest.raises(BucketedTableError):
            merge_into(spark, lp, ups, key="doc_id")
        with pytest.raises(BucketedTableError):
            delete_from(spark, lp, "grp = 1")
        with pytest.raises(BucketedTableError):
            update_where(spark, lp, "grp = 1", {"grp": F.lit(2)})
        with pytest.raises(BucketedTableError):
            insert_into(spark, lp, ups)
        with pytest.raises(BucketedTableError):
            compact(spark, lp)
        with pytest.raises(BucketedTableError):
            delete_from_mor(spark, lp, "grp = 1")
        with pytest.raises(BucketedTableError):
            delete_keys_mor(spark, lp, "doc_id", ["doc-1"])
        with pytest.raises(BucketedTableError):
            purge_deletes(spark, lp)
        with pytest.raises(BucketedTableError):
            cluster_write(
                spark.read.parquet(lp), lp, by="doc_id", n_files=2
            )

    def test_rebucket_is_the_legal_rewrite(self, spark, pair, tmp_path):
        # the sanctioned path: bucket_write() re-materializes to a new
        # bucketed table (same-path self-overwrite is Spark-illegal)
        lp = pair[2]
        df = spark.read.parquet(lp).filter("grp <> 1")
        out = str(tmp_path / "rebucketed")
        r = bucket_write(df, "t9d_rebucket", "doc_id", NB, out)
        try:
            assert r["rows"] == N - N // 100
            assert spark.table("t9d_rebucket").filter("grp = 1").count() == 0
        finally:
            spark.sql("DROP TABLE IF EXISTS t9d_rebucket")


class TestBucketedLayout:
    def test_one_file_per_bucket(self, pair):
        lp, r1 = pair[2], pair[4]
        files = [f for f in os.listdir(lp) if f.endswith(".parquet")]
        # repartition(N, keys) before bucketBy: exactly one file/bucket
        assert len(files) == NB
        assert r1["rows"] == N

    def test_external_table_data_survives_drop(self, spark, pair):
        ln, lp = pair[0], pair[2]
        spark.sql(f"DROP TABLE {ln}")
        assert spark.read.parquet(lp).count() == N  # files untouched

    def test_plain_read_still_works(self, spark, pair):
        lp = pair[2]
        df = spark.read.parquet(lp)
        assert df.count() == N
        assert set(df.columns) == {"doc_id", "grp"}
