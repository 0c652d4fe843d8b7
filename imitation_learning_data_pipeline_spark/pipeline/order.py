"""Storage-order capture for keep-first / monotonicity semantics.

The reference's "first occurrence" and "as stored" semantics
(align_transform_refactored.py:108-110, validate_one.py:93-94) are
properties of FILE order. ``monotonically_increasing_id()`` only
approximates that: Spark bin-packs file splits into input partitions by
descending size, so partition-index order does not track (file, byte)
order once a file exceeds maxPartitionBytes or multiple files share a
scan — at scale "first occurrence" could silently differ from the
reference.

The exact key is the parquet reader's hidden ``_metadata`` column:
(file_path, row_index) is the true storage coordinate, stable under any
partitioning. Used when the DataFrame still exposes the file source;
in-memory frames (tests, synthetic unions) fall back to
monotonically_increasing_id, which is exact for them (no files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_storage_order(df: DataFrame, col_name: str) -> DataFrame:
    """Attach an orderable storage-position column named ``col_name``.

    The column is a struct (file_path, row_index) when the hidden
    ``_metadata`` column resolves (file-backed reads); struct ordering is
    lexicographic, so Window.orderBy(col) sorts by file then row. Falls
    back to monotonically_increasing_id() for non-file frames.
    """
    try:
        out = df.withColumn(
            col_name,
            F.struct(
                F.col("_metadata.file_path").alias("f"),
                F.col("_metadata.row_index").alias("i"),
            ),
        )
        out.schema  # force analysis: raises if _metadata can't resolve
        return out
    except Exception:
        return df.withColumn(col_name, F.monotonically_increasing_id())
