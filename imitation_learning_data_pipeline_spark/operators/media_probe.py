"""External-process media metadata probe (reference S9: ffprobe).

Reference: validate/validate_one.py:18-46 — an ffprobe subprocess per
camera file, serial. Here the probe is an Arrow-batched UDF over a
*deduplicated* URI column: each distinct URI is probed once per task,
and executors need ffmpeg installed (reference Dockerfile.media:1-5) —
exactly the "external binary on executors" pattern (SURVEY §7.5 item 5).

If ffprobe is absent (this container), the probe degrades to
ok=False/error rows rather than failing the plan; parse_rational (F11,
validate_one.py:32-37) stays pure-SQL either way.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROBE_SCHEMA = (
    "uri string, ok boolean, nb_frames long, avg_fps double, duration double, "
    "error string"
)


def ffprobe_available() -> bool:
    return shutil.which("ffprobe") is not None


def _parse_rational(r: str | None) -> float | None:
    """'30000/1001' → 29.97 (validate_one.py:32-37)."""
    if not r:
        return None
    try:
        num, _, den = r.partition("/")
        d = float(den) if den else 1.0
        return float(num) / (d if d != 0 else 1.0)
    except ValueError:
        return None


def _probe_one(uri: str) -> dict:
    try:
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "v:0",
                "-show_entries", "stream=nb_frames,avg_frame_rate,duration",
                "-of", "json", uri,
            ],
            capture_output=True,
            timeout=30,
        )
        if out.returncode != 0:
            return {"ok": False, "error": out.stderr.decode()[:200]}
        streams = json.loads(out.stdout or b"{}").get("streams") or [{}]
        s = streams[0]
        nb = s.get("nb_frames")
        return {
            "ok": True,
            "nb_frames": int(nb) if nb is not None else None,
            "avg_fps": _parse_rational(s.get("avg_frame_rate")),
            "duration": float(s["duration"]) if s.get("duration") else None,
            "error": None,
        }
    except Exception as e:  # noqa: BLE001 — any probe failure is data, not a crash
        return {"ok": False, "error": str(e)[:200]}


def probe_videos(uris: DataFrame, uri_col: str = "video_uri") -> DataFrame:
    """Probe each distinct URI once (per-URI dedup before the expensive
    external call — the loop at validate_from_manifest_refactored.py:51
    probed per episode row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        have_ffprobe = ffprobe_available()
        for pdf in batches:
            recs = []
            for uri in pdf["uri"]:
                r = (
                    _probe_one(uri)
                    if have_ffprobe
                    else {"ok": False, "error": "ffprobe not installed"}
                )
                recs.append(
                    {
                        "uri": uri,
                        "ok": r.get("ok", False),
                        "nb_frames": r.get("nb_frames"),
                        "avg_fps": r.get("avg_fps"),
                        "duration": r.get("duration"),
                        "error": r.get("error"),
                    }
                )
            yield pd.DataFrame(recs)

    distinct = uris.select(F.col(uri_col).alias("uri")).where(
        F.col("uri").isNotNull()
    ).distinct()
    return distinct.mapInPandas(run, PROBE_SCHEMA)


def check_video_frames(
    probe: DataFrame,
    expected_rows: DataFrame,
    fps_expected: float = 30.0,
    fps_tolerance: float = 1.0,
    frames_tolerance: int = 2,
) -> DataFrame:
    """fps ±1.0 and frames-vs-rows ±2 checks (validate_one.py:124-137)."""
    j = probe.join(expected_rows, "uri", "left")
    return j.select(
        "uri",
        "ok",
        (F.abs(F.col("avg_fps") - fps_expected) <= fps_tolerance).alias("fps_ok"),
        (
            F.abs(F.col("nb_frames") - F.col("n_rows")) <= frames_tolerance
        ).alias("frames_ok"),
    )
