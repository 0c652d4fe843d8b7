"""Heterogeneous-shape episodes_stats.jsonl ingest (A7/F7).

Reference semantics under test (stats_refactored.py:80-201):
- count scalar vs per-dim list (first element) vs alias keys;
- one n per episode (action → observation.state → any feature) weighting
  every feature;
- episodes with no usable n skipped entirely;
- features with missing/misaligned vectors skipped per episode;
- scalar mean/std/min/max → 1-dim vectors;
- global combine = weighted parallel variance (S=Σn, mean=Σn·μ/S,
  var=Σn·(σ²+μ²)/S − mean², clamped ≥0).

Expected numbers are computed with an independent numpy reimplementation
of the reference formula inside the test, not by running the Spark code
twice.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest


LINES = [
    # ep 0: clean 2-dim vectors, count as scalar
    {
        "episode_index": 0,
        "stats": {
            "action": {
                "count": 100,
                "mean": [1.0, 2.0],
                "std": [0.5, 0.5],
                "min": [0.0, 1.0],
                "max": [2.0, 3.0],
            },
            "observation.state": {
                "count": 100,
                "mean": [10.0, 20.0],
                "std": [1.0, 2.0],
                "min": [8.0, 15.0],
                "max": [12.0, 25.0],
            },
        },
    },
    # ep 1: count as per-dim LIST; obs feature missing entirely
    {
        "episode_index": 1,
        "stats": {
            "action": {
                "count": [50, 50],
                "mean": [3.0, 4.0],
                "std": [1.5, 0.0],
                "min": [1.0, 4.0],
                "max": [5.0, 4.0],
            }
        },
    },
    # ep 2: action has NO count; n falls back to observation.state's
    # frame_count alias. action vectors still ingested, weighted by that n.
    {
        "episode_index": 2,
        "stats": {
            "action": {
                "mean": [5.0, 6.0],
                "std": [2.0, 1.0],
                "min": [2.0, 5.0],
                "max": [8.0, 7.0],
            },
            "observation.state": {
                "frame_count": 25,
                "mean": [30.0, 40.0],
                "std": [3.0, 4.0],
                "min": [25.0, 30.0],
                "max": [35.0, 50.0],
            },
        },
    },
    # ep 3: no usable count anywhere → whole episode skipped
    {
        "episode_index": 3,
        "stats": {
            "action": {"mean": [9.0, 9.0], "std": [1.0, 1.0], "min": [9.0, 9.0], "max": [9.0, 9.0]}
        },
    },
    # ep 4: action vectors width-misaligned (std has 3 dims) → action
    # skipped; obs scalar stats → 1-dim vectors (kept, separate width)
    {
        "episode_index": 4,
        "stats": {
            "action": {
                "count": 10,
                "mean": [1.0, 1.0],
                "std": [1.0, 1.0, 1.0],
                "min": [0.0, 0.0],
                "max": [2.0, 2.0],
            },
            "observation.state": {
                "count": 10,
                "mean": 7.0,
                "std": 0.5,
                "min": 6.0,
                "max": 8.0,
            },
        },
    },
]


@pytest.fixture(scope="module")
def stats_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("stats") / "episodes_stats.jsonl"
    with open(p, "w") as f:
        for row in LINES:
            f.write(json.dumps(row) + "\n")
        f.write("\n")  # blank line must be ignored
    return str(p)


def _reference_combine(entries):
    """Independent numpy reimplementation of _init_acc/_acc/_finalize."""
    S = sum(n for n, *_ in entries)
    mean = sum(n * np.asarray(mu) for n, mu, *_ in entries) / S
    ex2 = (
        sum(
            n * (np.asarray(sd) ** 2 + np.asarray(mu) ** 2)
            for n, mu, sd, _, _ in entries
        )
        / S
    )
    var = np.maximum(ex2 - mean**2, 0.0)
    mn = np.min([m for _, _, _, m, _ in entries], axis=0)
    mx = np.max([m for _, _, _, _, m in entries], axis=0)
    return S, mean, np.sqrt(var), mn, mx


def test_ingest_rows(spark, stats_path):
    from imitation_learning_data_pipeline_spark.pipeline import read_episode_stats_jsonl

    rows = {
        (r.episode_index, r.feature): r
        for r in read_episode_stats_jsonl(spark, stats_path).collect()
    }
    # ep0 both features; ep1 action only; ep2 both (action weighted by
    # obs's aliased n=25); ep3 skipped; ep4 obs only (action misaligned).
    assert set(rows) == {
        (0, "action"),
        (0, "observation.state"),
        (1, "action"),
        (2, "action"),
        (2, "observation.state"),
        (4, "observation.state"),
    }
    assert rows[(0, "action")]["count"] == 100
    assert rows[(1, "action")]["count"] == 50  # first element of the list
    assert rows[(2, "action")]["count"] == 25  # episode n from obs alias
    assert rows[(4, "observation.state")].mean == [7.0]  # scalar → 1-dim
    assert rows[(1, "action")].std == [1.5, 0.0]


def test_global_combine_matches_reference_formula(spark, stats_path):
    from imitation_learning_data_pipeline_spark.pipeline import (
        combine_global_stats,
        read_episode_stats_jsonl,
    )

    es = read_episode_stats_jsonl(spark, stats_path)
    # Restrict to the 2-dim action entries (eps 0, 1, 2) — the global
    # combine is per-feature.
    got = {
        r.feature: r for r in combine_global_stats(es).collect()
    }["action"]

    entries = [
        (100, [1.0, 2.0], [0.5, 0.5], [0.0, 1.0], [2.0, 3.0]),
        (50, [3.0, 4.0], [1.5, 0.0], [1.0, 4.0], [5.0, 4.0]),
        (25, [5.0, 6.0], [2.0, 1.0], [2.0, 5.0], [8.0, 7.0]),
    ]
    S, mean, std, mn, mx = _reference_combine(entries)
    assert got["count"] == S
    assert np.allclose(got.mean, mean)
    assert np.allclose(got.std, std)
    assert np.allclose(got.min, mn)
    assert np.allclose(got.max, mx)


def test_validated_ids_semi_join(spark, stats_path):
    from imitation_learning_data_pipeline_spark.pipeline import (
        combine_global_stats,
        read_episode_stats_jsonl,
    )

    es = read_episode_stats_jsonl(spark, stats_path)
    ids = spark.createDataFrame([(0,), (1,)], "episode_index long")
    got = {r.feature: r for r in combine_global_stats(es, validated_ids=ids).collect()}
    assert got["action"]["count"] == 150  # eps 0 + 1 only
