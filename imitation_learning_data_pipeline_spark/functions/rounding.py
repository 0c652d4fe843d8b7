"""Cross-engine-portable decimal rounding.

Fractional ``round(x, k)`` of a DOUBLE is NOT bit-portable between
engines: Spark rounds the value's SHORTEST DECIMAL REPRESENTATION
(``BigDecimal.valueOf(double)`` goes through ``Double.toString``,
HALF_UP), while DuckDB/C++ round the EXACT BINARY value. The two
disagree exactly when the shortest repr lands on a decimal half whose
binary neighbour sits below it — e.g. ``307.03 / 8``: shortest repr
``38.37875`` (Spark → 38.3788) but binary value ``38.3787499999…``
(DuckDB → 38.3787). Ratios of small integers and of 2-decimal sums hit
this constantly (any value that is truly ``m·10^-(k+1)`` with odd m).

Round-to-INTEGER is portable: every representable half IS exact in
binary (``k.5`` is a dyadic rational), so shortest-repr and
exact-binary rounding see the same value, and Spark's HALF_UP agrees
with C++ ``round``'s half-away-from-zero on positives and negatives
alike. :func:`quantize` therefore scales, integer-rounds, and
rescales — ``round(x·10^k)/10^k`` — producing a bit-identical DOUBLE
on every engine given bit-identical input.

Oracle-side idiom (DuckDB):

    CAST(round(expr * 10000) AS BIGINT) / 10000.0

Established by plans/numeric.py::vector_zscore (rounds 1-2 driver-hash
failures) and plans/rollup.py::rollup_events_daily (round 9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, k: int) -> Column:
    """``round(col, k)`` via portable integer rounding (see module doc).

    The result differs from ``F.round(col, k)`` only at shortest-repr
    half boundaries — where ``F.round`` is the one disagreeing with
    IEEE arithmetic everywhere else.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**k)
    return F.round(c * p).cast("long").cast("double") / F.lit(p)


def oracle_quantize(expr: str, k: int) -> str:
    """The matching DuckDB SQL fragment for :func:`quantize`."""
    p = 10**k
    return f"CAST(round(({expr}) * {p}) AS BIGINT) / {p}.0"
