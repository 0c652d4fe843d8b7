"""SparkSession factory tuned for this engine.

Local test profile targets local[N] single-JVM mode; the settings that
matter at cluster scale (AQE, skew-join handling, shuffle partitions,
broadcast threshold) are the same knobs a 1000-executor deployment would
set — nothing here is local-only except master/driver memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "imitation_learning_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    AQE is enabled so runtime statistics re-plan joins (broadcast demotion/
    promotion, skew-join splitting, partition coalescing) — on a real
    cluster this is what keeps a 100 TB shuffle from being dominated by a
    few skewed reducers.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark 4 routes lower()/upper() through ICU for full Unicode case
        # mapping; CollationAwareUTF8String's class init loads ICU locale
        # data, measured 10-60 s in this container with every task blocked
        # on the init monitor — it made whichever query FIRST touched
        # lower() look 20-200x slower (thread dump: all 32 workers
        # "waiting on the Class initialization monitor" in
        # CollationSupport$Lower.execBinaryICU). JVM case mapping is still
        # Unicode-correct and matches DuckDB on this corpus.
        .config("spark.sql.icu.caseMappings.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin per-session settings every contract query depends on.

    Called at the top of every driver-contract query so the plan behaves
    the same no matter how the caller built its session (the driver's
    harness does not use :func:`get_spark`):
    - UTC timezone: timestamp↔string casts agree with the DuckDB oracle.
    - ICU case mappings off: see the get_spark comment — ICU class init
      stalls the first lower()/upper() query by 10-60 s per JVM.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    return spark
