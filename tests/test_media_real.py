"""REAL-ffprobe integration (r9 verdict item 6): the non-degraded S9
arm, exercised wherever ffmpeg/ffprobe exist (the reference's media
image, Dockerfile.media:1-5) and SKIPPED — loudly, not silently absent
— in containers without them (like this sandbox).

The fixture is a genuine encoded MP4 (`ffmpeg -f lavfi testsrc`), not
the box-only synthetic from conftest, so ffprobe decodes actual codec
metadata. Covers: the probe_videos Arrow-batched real arm, agreement
between the ffprobe arm and the pure-Python ISO-BMFF fallback on the
same bytes, and validate(check_videos=True) end-to-end with the
DEFAULT prober (no probe_fn injection)."""

from __future__ import annotations

import shutil
import subprocess

import pytest

_FFMPEG = shutil.which("ffmpeg")
_FFPROBE = shutil.which("ffprobe")

pytestmark = pytest.mark.skipif(
    not (_FFMPEG and _FFPROBE),
    reason="ffmpeg/ffprobe not installed — real-media arm runs in the "
    "media image only (degraded-mode coverage lives in test_round5_ops)",
)

N_FRAMES, FPS, DUR = 60, 30, 2.0


@pytest.fixture(scope="module")
def real_mp4(tmp_path_factory):
    p = tmp_path_factory.mktemp("media") / "real.mp4"
    subprocess.run(
        [
            _FFMPEG, "-v", "error", "-y",
            "-f", "lavfi", "-i",
            f"testsrc=duration={DUR}:size=64x64:rate={FPS}",
            "-pix_fmt", "yuv420p", str(p),
        ],
        check=True,
        timeout=60,
    )
    return str(p)


class TestRealFfprobe:
    def test_probe_one_real_arm(self, real_mp4):
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            _probe_one,
            ffprobe_available,
        )

        assert ffprobe_available()
        r = _probe_one(real_mp4)
        assert r["ok"], r
        assert r["nb_frames"] == N_FRAMES
        assert abs(r["avg_fps"] - FPS) <= 1.0
        assert abs(r["duration"] - DUR) <= 0.2

    def test_real_and_python_probes_agree(self, real_mp4):
        # the fallback's honesty check: same file, same three fields
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            _probe_one,
            probe_mp4_python,
        )

        a, b = _probe_one(real_mp4), probe_mp4_python(real_mp4)
        assert a["ok"] and b["ok"]
        assert a["nb_frames"] == b["nb_frames"]
        assert abs(a["avg_fps"] - b["avg_fps"]) <= 0.5
        assert abs(a["duration"] - b["duration"]) <= 0.2

    def test_probe_videos_distinct_and_real(self, spark, real_mp4):
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_videos,
        )

        uris = spark.createDataFrame(
            [(real_mp4,), (real_mp4,), (None,)], "video_uri string"
        )
        rows = probe_videos(uris).collect()
        assert len(rows) == 1  # distinct-URI dedup before the subprocess
        r = rows[0]
        assert r.ok and r.nb_frames == N_FRAMES and abs(r.avg_fps - FPS) <= 1.0

    def test_validate_check_videos_default_prober(self, spark, real_mp4):
        import numpy as np
        import pandas as pd

        from imitation_learning_data_pipeline_spark.pipeline import (
            validate_episodes,
        )

        n = N_FRAMES
        pdf = pd.DataFrame(
            {
                "action": [np.zeros(8, dtype=np.float32)] * n,
                "observation.state": [np.ones(8, dtype=np.float32)] * n,
                "timestamp": np.arange(n) / float(FPS),
                "frame_index": np.arange(n),
                "episode_index": np.zeros(n, dtype=np.int64),
                "index": np.arange(n),
                "task_index": np.zeros(n, dtype=np.int64),
            }
        )
        frames = spark.createDataFrame(pdf)
        manifest = spark.createDataFrame(
            [(0, real_mp4, real_mp4)],
            "episode_index long, video_front_uri string, video_wrist_uri string",
        )
        rep = validate_episodes(
            frames, manifest=manifest, check_videos=True
        ).collect()
        assert len(rep) == 1
        assert rep[0].ok and list(rep[0].issues) == []
