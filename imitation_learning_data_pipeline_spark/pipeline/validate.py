"""Validate stage: per-episode schema / order / width / null checks.

Reference: validate/validate_one.py:63-147 executed in a serial loop
(validate_from_manifest_refactored.py:51). Here the loop is gone: ONE
grouped aggregate computes every per-episode check for all episodes in a
single pass (mirroring the reference's own fused one-pass select at
validate_one.py:89-100), and the per-key meta lookup (validate_one.py:
48-50) becomes one broadcast join.

Check semantics reproduced exactly (incl. the strict/weak asymmetry,
SURVEY §8.5): frame_index strictly increasing, timestamp non-decreasing,
required-column null-any, vector width == 8, episode_index constant,
rows vs meta length within ±2 (validate_one.py:120-122).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

REQUIRED_COLS = [
    "action",
    "observation.state",
    "timestamp",
    "frame_index",
    "episode_index",
    "index",
    "task_index",
]  # validate_one.py:9-12
VECTOR_WIDTH = 8  # core/constants.py:19
ROWS_TOLERANCE = 2  # scripts/neura.py:88


FPS_EXPECTED = 30.0  # scripts/neura.py --fps default
FPS_TOLERANCE = 1.0  # validate_one.py:134

CAMERAS = ("front", "wrist")


def validate_episodes(
    frames: DataFrame,
    meta: DataFrame | None = None,
    rows_tolerance: int = ROWS_TOLERANCE,
    manifest: DataFrame | None = None,
    check_videos: bool = False,
    fps_expected: float = FPS_EXPECTED,
    fps_tolerance: float = FPS_TOLERANCE,
    probe_fn=None,
) -> DataFrame:
    """Per-episode validation report.

    ``frames``: all episodes in one DataFrame (episode_index column).
    ``meta``: optional episodes.jsonl-shaped (episode_index, length).
    Missing required columns fail the whole-frame schema check up front,
    like validate_one.py:84-86 — raised at plan time, not mid-job.

    ``check_videos=True`` (reference validate_one.py:124-137, the
    ``not skip_video`` branch) additionally probes each camera video from
    ``manifest`` (episode_index, video_front_uri, video_wrist_uri) and
    enforces, per camera: the video exists and is probeable
    (``{cam}_video_missing``), |fps − fps_expected| ≤ fps_tolerance
    (``{cam}_fps``), and |nb_frames − n_rows| ≤ rows_tolerance
    (``{cam}_frames_vs_rows``). A missing/unprobeable video records only
    the missing issue and suppresses the other two, mirroring the
    reference's ``continue``. ``probe_fn`` injects a fake prober in
    tests/containers without ffprobe; default is the distinct-URI
    Arrow-batched ``operators.media_probe.probe_videos``.
    """
    missing = [c for c in REQUIRED_COLS if c not in frames.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")

    # Monotonicity is a property of STORAGE order (the reference diffs the
    # column as stored, validate_one.py:93-94) — not of the sorted frame
    # order, which would be trivially monotone. Capture the (file_path,
    # row_index) storage coordinate before any shuffle (see order.py for
    # why monotonically_increasing_id alone is not safe at scale).
    from .order import with_storage_order

    frames = with_storage_order(frames, "__pos")
    w = Window.partitionBy("episode_index").orderBy("__pos")
    bt = lambda c: f"`{c}`"  # noqa: E731 — backtick dotted names (P2)

    # Narrow BEFORE the window exchange (optimization r16, guide §2.3):
    # the per-row derived values (vector widths, null flag) are pure
    # row functions, so computing them in a projection BELOW the
    # episode shuffle moves two ints per row through the exchange and
    # its sort instead of the two 8-double vectors (~16 bytes vs ~150).
    # Same expressions over the same rows — every aggregate below sees
    # identical values (max of per-row sizes == size of each row,
    # aggregated), so the report is bit-identical.
    narrowed = frames.select(
        "episode_index",
        "frame_index",
        "timestamp",
        "__pos",
        F.size(F.col(bt("observation.state"))).alias("__state_w"),
        F.size("action").alias("__action_w"),
        F.greatest(
            *[F.col(bt(c)).isNull().cast("int") for c in REQUIRED_COLS]
        ).alias("any_null_row"),
    )
    with_lag = narrowed.select(
        "episode_index",
        "frame_index",
        "timestamp",
        "__state_w",
        "__action_w",
        F.lag("frame_index").over(w).alias("prev_fi"),
        F.lag("timestamp").over(w).alias("prev_ts"),
        "any_null_row",
    )

    ok_flag = lambda cond: (F.min(F.when(cond, 1).otherwise(0)) == 1)  # noqa: E731
    report = with_lag.groupBy("episode_index").agg(
        F.count("*").alias("n_rows"),
        F.min("frame_index").alias("min_frame"),
        F.max("frame_index").alias("max_frame"),
        ok_flag(
            F.col("prev_fi").isNull() | (F.col("frame_index") > F.col("prev_fi"))
        ).alias("frame_index_strictly_increasing"),
        ok_flag(
            F.col("prev_ts").isNull() | (F.col("timestamp") >= F.col("prev_ts"))
        ).alias("timestamp_non_decreasing"),
        (F.max("any_null_row") == 0).alias("no_nulls"),
        F.max("__action_w").alias("action_width_max"),
        F.max("__state_w").alias("state_width_max"),
    )

    # Named checks → ok flag + nested issues array, mirroring the
    # reference's ValidationResult.issues (core/models.py:23-36; issue
    # names follow validate_one.py:106-122).
    checks = [
        ("frame_index_not_sorted", F.col("frame_index_strictly_increasing")),
        ("timestamp_not_sorted", F.col("timestamp_non_decreasing")),
        ("nulls_in_required_columns", F.col("no_nulls")),
        ("action_width", F.col("action_width_max") == VECTOR_WIDTH),
        ("state_width", F.col("state_width_max") == VECTOR_WIDTH),
    ]
    if meta is not None:
        # Broadcast meta join replaces the per-episode filter loop (J3).
        report = report.join(
            F.broadcast(meta.select("episode_index", F.col("length").alias("expected_rows"))),
            "episode_index",
            "left",
        )
        checks.append(
            (
                "rows_vs_meta",
                F.col("expected_rows").isNotNull()
                & (F.abs(F.col("n_rows") - F.col("expected_rows")) <= rows_tolerance),
            )
        )
    else:
        report = report.withColumn("expected_rows", F.lit(None).cast("long"))

    if check_videos:
        if manifest is None:
            raise ValueError("check_videos=True requires a manifest")
        from ..operators.media_probe import probe_videos

        # One URI row per episode: a manifest may carry several rows for
        # an episode index (tombstones, orphans, per-chunk rows) — max()
        # dedupes and prefers the non-null URI.
        cam_uris = manifest.groupBy("episode_index").agg(
            *[F.max(f"video_{cam}_uri").alias(f"video_{cam}_uri") for cam in CAMERAS]
        )
        all_uris = cam_uris.select(
            F.explode(
                F.array(*[F.col(f"video_{cam}_uri") for cam in CAMERAS])
            ).alias("uri")
        )
        prober = probe_fn or (lambda d: probe_videos(d, uri_col="uri"))
        probe = prober(all_uris)
        # Probe output is O(episodes × cameras) — broadcast both the URI
        # map and the probe results onto the per-episode report.
        report = report.join(F.broadcast(cam_uris), "episode_index", "left")
        for cam in CAMERAS:
            pcam = probe.select(
                F.col("uri").alias(f"video_{cam}_uri"),
                F.col("ok").alias(f"__{cam}_ok"),
                F.col("nb_frames").alias(f"__{cam}_nb"),
                F.col("avg_fps").alias(f"__{cam}_fps"),
            )
            report = report.join(F.broadcast(pcam), f"video_{cam}_uri", "left")
            has_video = F.col(f"video_{cam}_uri").isNotNull() & F.coalesce(
                F.col(f"__{cam}_ok"), F.lit(False)
            )
            fps_bad = (
                has_video
                & F.col(f"__{cam}_fps").isNotNull()
                & (F.abs(F.col(f"__{cam}_fps") - fps_expected) > fps_tolerance)
            )
            frames_bad = (
                has_video
                & F.col(f"__{cam}_nb").isNotNull()
                & (F.abs(F.col(f"__{cam}_nb") - F.col("n_rows")) > rows_tolerance)
            )
            checks.extend(
                [
                    (f"{cam}_video_missing", has_video),
                    (f"{cam}_fps", ~fps_bad),
                    (f"{cam}_frames_vs_rows", ~frames_bad),
                ]
            )
    ok = checks[0][1]
    for _, c in checks[1:]:
        ok = ok & c
    issues = F.array_compact(
        F.array(*[F.when(~c, F.lit(name)) for name, c in checks])
    )
    return (
        report.withColumn("ok", ok)
        .withColumn("issues", issues)
        .drop(*[f"__{cam}_{k}" for cam in CAMERAS for k in ("ok", "nb", "fps")])
    )


def validation_summary(report: DataFrame) -> DataFrame:
    """total/ok/fail counts (validate_from_manifest_refactored.py:110-113)."""
    return report.agg(
        F.count("*").alias("total"),
        F.sum(F.col("ok").cast("int")).cast("long").alias("ok"),
        F.sum((~F.col("ok")).cast("int")).cast("long").alias("fail"),
    )
