"""Round-9 mergeable histogram quantiles (plans/rollup.py): fixed-bin
state, elementwise merge associativity, interpolation accuracy, clamp
semantics, spec-mismatch rejection, and the store fold roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imitation_learning_data_pipeline_spark.plans.rollup import (
    finalize_rollup,
    fold_rollup_into_store,
    merge_rollup,
    read_rollup,
    rollup_partials,
    write_rollup_store,
)

QSPEC = {"v": (0.0, 100.0)}


def _mk(spark, n=6000, seed_shift=0):
    return spark.range(n).select(
        (F.col("id") % 3).alias("g"),
        (((F.col("id") + seed_shift) * 37) % 1000 / 10.0).alias("v"),
    )


class TestHistogramQuantiles:
    def test_merge_equals_single_pass(self, spark):
        df = _mk(spark)
        whole = finalize_rollup(
            rollup_partials(df, ["g"], ["v"], quantile_cols=QSPEC, n_bins=40)
        )
        halves = [
            rollup_partials(
                df.filter(F.col("id") % 2 == i),
                ["g"],
                ["v"],
                quantile_cols=QSPEC,
                n_bins=40,
            )
            for i in (0, 1)
        ]
        merged = finalize_rollup(merge_rollup(halves[0].unionByName(halves[1])))
        a = sorted((r.asDict() for r in whole.collect()), key=lambda d: d["g"])
        b = sorted((r.asDict() for r in merged.collect()), key=lambda d: d["g"])
        assert a == b  # histogram add is exact, not approximate

    def test_accuracy_within_two_bins(self, spark):
        df = _mk(spark)
        n_bins = 50
        width = 100.0 / n_bins
        est = {
            r["g"]: (r["v_p50"], r["v_p95"], r["v_p99"])
            for r in finalize_rollup(
                rollup_partials(
                    df, ["g"], ["v"], quantile_cols=QSPEC, n_bins=n_bins
                )
            ).collect()
        }
        exact = {
            r["g"]: (r["e50"], r["e95"], r["e99"])
            for r in df.groupBy("g")
            .agg(
                F.percentile("v", 0.5).alias("e50"),
                F.percentile("v", 0.95).alias("e95"),
                F.percentile("v", 0.99).alias("e99"),
            )
            .collect()
        }
        for g, (p50, p95, p99) in est.items():
            e50, e95, e99 = exact[g]
            assert abs(p50 - e50) <= 2 * width
            assert abs(p95 - e95) <= 2 * width
            assert abs(p99 - e99) <= 2 * width

    def test_out_of_domain_clamps_to_end_bins(self, spark):
        df = spark.createDataFrame(
            [(0, -50.0), (0, 20.0), (0, 500.0)], "g long, v double"
        )
        p = rollup_partials(df, ["g"], ["v"], quantile_cols=QSPEC, n_bins=10)
        hist = p.select("v__hist").first()[0]
        assert hist[0] == 1  # -50 clamped low
        assert hist[2] == 1  # 20 in its bin
        assert hist[9] == 1  # 500 clamped high
        assert sum(hist) == 3

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [(0, 10.0), (0, None), (0, 30.0)], "g long, v double"
        )
        hist = (
            rollup_partials(df, ["g"], ["v"], quantile_cols=QSPEC, n_bins=10)
            .select("v__hist")
            .first()[0]
        )
        assert sum(hist) == 2

    def test_spec_mismatch_raises(self, spark):
        df = _mk(spark, n=300)
        a = rollup_partials(df, ["g"], ["v"], quantile_cols={"v": (0.0, 100.0)})
        b = rollup_partials(df, ["g"], ["v"], quantile_cols={"v": (0.0, 200.0)})
        with pytest.raises(ValueError, match="histogram specs disagree"):
            merge_rollup(a.unionByName(b))

    def test_bad_domain_raises(self, spark):
        df = _mk(spark, n=10)
        with pytest.raises(ValueError, match="hi > lo"):
            rollup_partials(df, ["g"], ["v"], quantile_cols={"v": (5.0, 5.0)})

    def test_cli_quantiles(self, spark, tmp_path, capsys):
        import json

        from imitation_learning_data_pipeline_spark.cli import main

        p = str(tmp_path / "ev")
        _mk(spark).write.parquet(p)
        rc = main(
            [
                "rollup",
                "--input",
                p,
                "--group",
                "g",
                "--metrics",
                "v",
                "--quantiles",
                "v:0:100",
                "--n-bins",
                "50",
            ]
        )
        rows = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert rc == 0 and len(rows) == 3
        assert all("v_p50" in r and "v_p95" in r and "v_p99" in r for r in rows)

    def test_streaming_rollup_carries_histograms(self, spark, tmp_path):
        """The streaming twin folds quantile state batch by batch: two
        micro-batches through run_incremental_rollup_stream must read
        back the exact histogram the one-shot batch path computes."""
        from imitation_learning_data_pipeline_spark.streaming.incremental import (
            run_incremental_rollup_stream,
        )

        src, store, ckpt = (
            str(tmp_path / d) for d in ("src", "store", "ckpt")
        )
        base = spark.range(2000).select(
            "id",
            (F.col("id") % 3).alias("g"),
            ((F.col("id") * 37) % 1000 / 10.0).alias("v"),
        )
        df = base.select("g", "v")
        base.filter(F.col("id") % 2 == 0).drop("id").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        base.filter(F.col("id") % 2 == 1).drop("id").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema("g long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_incremental_rollup_stream(
            stream,
            ["g"],
            ["v"],
            store,
            ckpt,
            quantile_cols=QSPEC,
            n_bins=40,
        )
        got = sorted(
            (r["g"], r["v_p50"], r["v_p95"])
            for r in read_rollup(spark, store).collect()
        )
        whole = sorted(
            (r["g"], r["v_p50"], r["v_p95"])
            for r in finalize_rollup(
                rollup_partials(
                    df, ["g"], ["v"], quantile_cols=QSPEC, n_bins=40
                )
            ).collect()
        )
        assert got == whole

    def test_store_fold_roundtrip(self, spark, tmp_path):
        df0, df1 = _mk(spark), _mk(spark, seed_shift=17)
        p0 = rollup_partials(df0, ["g"], ["v"], quantile_cols=QSPEC, n_bins=40)
        p1 = rollup_partials(df1, ["g"], ["v"], quantile_cols=QSPEC, n_bins=40)
        store = str(tmp_path / "qstore")
        write_rollup_store(p0, store)
        fold_rollup_into_store(spark, store, p1, batch_id=1)
        got = sorted(
            (r["g"], r["v_p50"], r["v_p95"])
            for r in read_rollup(spark, store).collect()
        )
        whole = sorted(
            (r["g"], r["v_p50"], r["v_p95"])
            for r in finalize_rollup(
                merge_rollup(p0.unionByName(p1))
            ).collect()
        )
        assert got == whole  # the fold preserved histogram state exactly
