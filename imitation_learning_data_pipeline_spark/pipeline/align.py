"""Align & Transform stage: clean / cast / dedup / reindex / normalize.

Reference: steps/align_transform_refactored.py:82-136 — one lazy plan per
episode in a serial file loop. Here: ONE plan over all episodes using
windows partitioned by episode_index.

Reproduced quirks (parity mode, SURVEY §8):
- reindex happens BEFORE the null/NaN drop, so frame_index may have gaps
  after cleaning (§8.3 — likely a reference bug, kept for parity; pass
  ``reindex_after_clean=True`` for the fixed behaviour);
- σ==0 dimensions are centered only (divide by 1, :73-74);
- rows whose vectors aren't width-8 are dropped (:43-48).

Keep-first dedup discipline (SURVEY §7.5 item 1): "first occurrence in
file order" is undefined after a shuffle, so the original position is
captured at scan time BEFORE any wide transformation — the parquet
reader's (_metadata.file_path, _metadata.row_index) storage coordinate
for file-backed frames (exact under any partitioning), else
monotonically_increasing_id (see order.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .validate import VECTOR_WIDTH

STATE = "observation.state"


def align_transform(
    frames: DataFrame,
    global_stats: dict[str, dict[str, list[float]]] | None = None,
    reindex_after_clean: bool = False,
) -> DataFrame:
    """Full align/transform chain for all episodes in one plan.

    ``global_stats``: {feature: {"mean": [...], "std": [...]}} as produced
    by stats (global_stats.json shape). Malformed/wrong-width stats →
    normalization silently skipped for that feature
    (align_transform_refactored.py:62-68,128-130 — reproduced).
    """
    # Capture storage order BEFORE any shuffle (W2 discipline): the
    # (file_path, row_index) coordinate when file-backed, else
    # monotonically_increasing_id (see order.py).
    from .order import with_storage_order

    df = with_storage_order(frames, "__orig_pos")

    # Casts to stable dtypes (:28-40).
    df = df.withColumns(
        {
            "timestamp": F.col("timestamp").cast("double"),
            "frame_index": F.col("frame_index").cast("long"),
            "episode_index": F.col("episode_index").cast("long"),
            "index": F.col("index").cast("long"),
            "task_index": F.col("task_index").cast("long"),
            "action": F.col("action").cast("array<float>"),
            STATE: F.col(f"`{STATE}`").cast("array<float>"),
        }
    )

    # Vector-width filter (:43-48).
    df = df.filter(
        (F.size("action") == VECTOR_WIDTH) & (F.size(f"`{STATE}`") == VECTOR_WIDTH)
    )

    # One exchange for the whole window chain: episode_index partitioning
    # satisfies the finer (episode_index, frame_index) clustering of the
    # dedup window as well as the reindex window (subset rule).
    df = df.repartition("episode_index")

    # Sort + dedup keep-first on frame_index (:108-110): first occurrence
    # in original file order wins.
    w_dedup = Window.partitionBy("episode_index", "frame_index").orderBy("__orig_pos")
    df = (
        df.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    w_order = Window.partitionBy("episode_index").orderBy("frame_index")
    reindex = (F.row_number().over(w_order) - 1).cast("long")
    null_ok = (
        F.col("timestamp").isNotNull()
        & ~F.isnan("timestamp")
        & F.col("frame_index").isNotNull()
        & F.col("episode_index").isNotNull()
    )

    if reindex_after_clean:
        df = df.filter(null_ok).withColumn("frame_index", reindex)
    else:
        # Parity: reindex precedes the null/NaN drop (:111 before :114-119).
        df = df.withColumn("frame_index", reindex).filter(null_ok)

    # Per-dimension z-score via higher-order transform (:51-78 → F6).
    if global_stats:
        for feat in ("action", STATE):
            st = global_stats.get(feat)
            if not st:
                continue
            mean, std = st.get("mean"), st.get("std")
            if (
                not mean
                or not std
                or len(mean) != VECTOR_WIDTH
                or len(std) != VECTOR_WIDTH
            ):
                continue  # silent skip (:62-68)
            mean_arr = F.array(*[F.lit(float(v)) for v in mean])
            std_arr = F.array(*[F.lit(float(v)) for v in std])
            centered = F.zip_with(
                F.col(f"`{feat}`").cast("array<double>"), mean_arr, lambda x, m: x - m
            )
            df = df.withColumn(
                feat,
                F.zip_with(
                    centered,
                    std_arr,
                    lambda x, s: (x / F.when(s == 0.0, 1.0).otherwise(s)).cast("float"),
                ),
            )

    return df.drop("__orig_pos")
