"""Bounded registry for persist() pins created inside lazy plan builders.

Several query builders persist an intermediate that multiple branches of
the SAME plan consume (minhash signatures, LSH ok-band rows, ngram
posting lists). The builder returns a LAZY DataFrame, so it cannot
unpersist synchronously — but never unpersisting leaks cached relations
across a long-lived session (streaming reconciliation loops, contract
runs; bench.py works around it with clearCache()).

Policy here: pins are registered per-builder-invocation, and each new
builder invocation EVICTS all pins from prior invocations, so at most
one plan's pins are ever resident. Evicting a pin is always
correctness-safe for these frames — unpersist() drops the cache, not the
lineage; a still-unmaterialized earlier plan simply recomputes.
(The discover listing snapshot is NOT managed here: its pin carries
eager-snapshot semantics and has its own bounded registry in
pipeline/discover.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINS: list[DataFrame] = []


def begin_plan() -> None:
    """Start a new builder invocation: evict every prior plan's pins."""
    clear_plan_cache()


def pin(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for eviction by the next plan."""
    _PINS.append(df.persist())
    return df


def clear_plan_cache() -> None:
    """Unpersist every registered pin (idempotent; safe mid-plan only if
    you accept recomputation)."""
    while _PINS:
        _PINS.pop().unpersist()
