"""Vector (array<float>) expressions — all higher-order built-ins, no UDFs.

Reference analogue: the 8-dim state/action vectors
(core/constants.py:19) and the elementwise z-score
(align_transform_refactored.py:51-78, a ``map_elements`` Python lambda
there). Here every elementwise op is `F.transform`/`F.zip_with`/
`F.aggregate` — JVM-side, codegen-friendly, and at 100 TB that is the
difference between a vectorized scan and a Python serde bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    """array<float> → array<double> so accumulation happens in f64."""
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + aggregate (accumulates in double)."""
    prod = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def zscore(
    vec: Column | str, mean_arr: Column, std_arr: Column
) -> Column:
    """Elementwise (v[i] − μ[i]) / σ[i], with σ==0 → divide by 1.

    σ==0 guard mirrors align_transform_refactored.py:73-74 (center-only
    for constant dimensions) — reproduced, not "fixed".
    """
    centered = F.zip_with(as_double(vec), mean_arr, lambda x, m: x - m)
    return F.zip_with(
        centered,
        std_arr,
        lambda x, s: x / F.when(s == 0.0, 1.0).otherwise(s),
    )
