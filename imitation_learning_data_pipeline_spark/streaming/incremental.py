"""Structured Streaming variants of the incremental-ingest semantics.

Reference mapping (SURVEY §2.9): the reference's hand-rolled incremental
Discover (fingerprint diff, --since cutoff, PENDING re-pickup) is a
file-source stream here; its per-frame timestamp ordering is event-time,
so late data is a watermark, not a sleep-loop.

The driver contract needs plain DataFrames, so each streaming query runs
with Trigger.availableNow into an in-memory sink and returns the final
table — same code path a continuous deployment would run with a real
trigger + checkpoint; only the trigger/sink differ.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import TABLE_SCHEMAS, _events_ts_unit


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table, normalizing `ts` to a
    microsecond timestamp across testdata generations (same footer
    sniffing as the batch reader — see load_table)."""
    from pyspark.sql import types as T

    unit = _events_ts_unit(sf_dir)
    schema = TABLE_SCHEMAS["events"]
    if unit in ("ns", "int"):
        schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
                for f in schema.fields
            ]
        )
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if unit == "ns":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if unit == "int":
        return raw.withColumn("ts", F.timestamp_seconds(F.col("ts")))
    return raw


def run_stream_to_batch(
    streaming_df: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan over all currently-available data and
    return the result as a batch DataFrame (memory sink, availableNow).

    ``output_mode``: aggregations use "complete"; arbitrary-stateful
    operators (applyInPandasWithState) only support "update"/"append".
    """
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) running counts as a stream — the streaming
    shape of discover's incremental diff: each micro-batch folds new
    files into stateful aggregates keyed like the manifest."""
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_stream_to_batch(agg, spark)


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 2-hour watermark.

    With availableNow over static files nothing is late, so the result
    equals the batch date_trunc aggregation — which is exactly what the
    DuckDB oracle checks.
    """
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return run_stream_to_batch(agg, spark)
