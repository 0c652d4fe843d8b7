"""Media metadata probe (reference S9: ffprobe), with a pure-Python
ISO-BMFF fallback.

Reference: validate/validate_one.py:18-46 — an ffprobe subprocess per
camera file, serial. Here the probe is an Arrow-batched UDF over a
*deduplicated* URI column: each distinct URI is probed once per task,
and executors need ffmpeg installed (reference Dockerfile.media:1-5) —
exactly the "external binary on executors" pattern (SURVEY §7.5 item 5).

If ffprobe is absent (this container), the probe falls back to a
dependency-free MP4 box parser (`probe_mp4_python`): it walks the
ISO-BMFF box tree (public spec, ISO/IEC 14496-12) and reads
nb_frames/duration/fps from ``moov → trak → mdia → {mdhd, hdlr,
minf/stbl/{stts,stsz}}`` — the same three fields the reference pulls
from ffprobe's ``stream=nb_frames,avg_frame_rate,duration``. Non-MP4
containers still degrade to ok=False/error rows rather than failing the
plan; parse_rational (F11, validate_one.py:32-37) stays pure-SQL either
way.
"""

from __future__ import annotations

import json
import shutil
import struct
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


# --- pure-Python ISO-BMFF (MP4) metadata parser ------------------------------

def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for the boxes in buf[start:end].

    Box = 4-byte big-endian size + 4-byte type; size==1 → 64-bit
    largesize follows; size==0 → box extends to the end of the
    enclosing container (ISO/IEC 14496-12 §4.2).
    """
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return
        yield typ.decode("latin1"), off + hdr, off + size
        off += size


def _find_box(buf: bytes, start: int, end: int, path: list[str]) -> tuple[int, int] | None:
    """Descend a container path like ['mdia', 'minf', 'stbl', 'stts']."""
    head, *rest = path
    for typ, s, e in _iter_boxes(buf, start, end):
        if typ == head:
            return (s, e) if not rest else _find_box(buf, s, e, rest)
    return None


def _mdhd_timescale_duration(buf: bytes, s: int) -> tuple[int, int]:
    """mdhd: version 0 → u32 timescale@12, u32 duration@16;
    version 1 → u32 timescale@20, u64 duration@24."""
    if buf[s] == 1:
        return (
            struct.unpack_from(">I", buf, s + 20)[0],
            struct.unpack_from(">Q", buf, s + 24)[0],
        )
    return (
        struct.unpack_from(">I", buf, s + 12)[0],
        struct.unpack_from(">I", buf, s + 16)[0],
    )


def probe_mp4_python(path: str) -> dict:
    """ffprobe-shaped metadata from the MP4 box tree, no dependencies.

    Walks moov → trak, picks the first track whose hdlr handler_type is
    'vide', and reads: nb_frames from stsz sample_count (falling back to
    the stts sample-count sum), duration from mdhd duration/timescale,
    avg_fps = nb_frames / duration. Returns the same dict shape as the
    ffprobe path so check_video_frames (validate_one.py:124-137) is
    agnostic to which probe produced the row.
    """
    try:
        with open(path, "rb") as f:
            buf = f.read()
        moov = _find_box(buf, 0, len(buf), ["moov"])
        if moov is None:
            return {"ok": False, "error": "no moov box (not an MP4?)"}
        for typ, ts, te in _iter_boxes(buf, *moov):
            if typ != "trak":
                continue
            hdlr = _find_box(buf, ts, te, ["mdia", "hdlr"])
            # handler_type: u32 version/flags + u32 pre_defined, then 4cc
            if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
                continue
            mdhd = _find_box(buf, ts, te, ["mdia", "mdhd"])
            if mdhd is None:
                continue
            timescale, dur_units = _mdhd_timescale_duration(buf, mdhd[0])
            nb = None
            stsz = _find_box(buf, ts, te, ["mdia", "minf", "stbl", "stsz"])
            if stsz is not None:
                nb = struct.unpack_from(">I", buf, stsz[0] + 8)[0]
            if not nb:
                stts = _find_box(buf, ts, te, ["mdia", "minf", "stbl", "stts"])
                if stts is not None:
                    n_ent = struct.unpack_from(">I", buf, stts[0] + 4)[0]
                    nb = sum(
                        struct.unpack_from(">I", buf, stts[0] + 8 + 8 * i)[0]
                        for i in range(n_ent)
                    )
            duration = dur_units / timescale if timescale else None
            fps = nb / duration if (nb and duration) else None
            return {
                "ok": True,
                "nb_frames": nb,
                "avg_fps": fps,
                "duration": duration,
                "error": None,
            }
        return {"ok": False, "error": "no video track in moov"}
    except Exception as e:  # noqa: BLE001 — any probe failure is data, not a crash
        return {"ok": False, "error": f"mp4 parse: {str(e)[:180]}"}


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
                # ffprobe when present (any container); pure-Python MP4
                # box parse otherwise — S9 no longer degrades to
                # error rows on ffprobe-less executors.
                r = (
                    _probe_one(uri)
                    if have_ffprobe
                    else probe_mp4_python(uri.removeprefix("file:"))
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
