"""Deterministic LeRobot-shaped synthetic dataset generator.

Builds the same tree the reference pipeline consumes
(`data/chunk-*/episode_*.parquet`, `videos/chunk-*/cam_*/episode_*.mp4`,
`meta/episodes.jsonl` — robot_data/meta/info.json:14-15, FIXTURES.md §B)
at an arbitrary episode count, so the five pipeline stages can be driven
end-to-end at bench scale, not just on the 20-episode pytest fixture.

Defect injection mirrors tests/conftest.py (same episode numbers) so the
stages always have work to do: duplicate frame (ep 3), NaN timestamp
(ep 5), bad vector width (ep 7), out-of-order frame_index (ep 11),
meta length off (ep 13), missing wrist video (ep 17), orphan video
(ep 19).

Generation is driver-side pyarrow (one file per episode is the LAYOUT
being tested — a distributed write would produce task-sized files, not
episode-sized ones) and is cached: a marker file keyed by the parameters
skips regeneration.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

VECTOR_WIDTH = 8
FPS = 30.0


def ensure_lerobot_tree(
    root: str,
    n_episodes: int = 102,
    frames_per_episode: int = 366,
    episodes_per_chunk: int = 32,
    seed: int = 42,
) -> str:
    """Create (or reuse) a synthetic LeRobot tree at ``root``."""
    # v2: adds the episodes_stats.jsonl sidecar — older cached trees
    # regenerate.
    marker = os.path.join(
        root,
        f".complete-v2-{n_episodes}-{frames_per_episode}-{episodes_per_chunk}-{seed}",
    )
    if os.path.exists(marker):
        return root

    rng = np.random.default_rng(seed)
    meta_rows = []
    global_index = 0
    for ep in range(n_episodes):
        chunk = f"chunk-{ep // episodes_per_chunk:03d}"
        data_dir = os.path.join(root, "data", chunk)
        os.makedirs(data_dir, exist_ok=True)
        if ep % 20 == 19:
            continue  # orphan video only (no parquet)
        n = frames_per_episode + int(rng.integers(-20, 20))
        fi = np.arange(n)
        pdf = pd.DataFrame(
            {
                "action": list(rng.normal(0, 1, size=(n, VECTOR_WIDTH)).astype(np.float32)),
                "observation.state": list(
                    rng.normal(5, 2, size=(n, VECTOR_WIDTH)).astype(np.float32)
                ),
                "timestamp": fi / FPS,
                "frame_index": fi,
                "episode_index": np.full(n, ep),
                "index": np.arange(global_index, global_index + n),
                "task_index": np.zeros(n, dtype=np.int64),
            }
        )
        global_index += n
        if ep % 20 == 3:  # duplicated frame_index (keep-first target)
            dup = pdf.iloc[[10]].copy()
            dup["action"] = [np.full(VECTOR_WIDTH, 99.0, dtype=np.float32)]
            pdf = pd.concat([pdf.iloc[:11], dup, pdf.iloc[11:]]).reset_index(drop=True)
        if ep % 20 == 5:
            pdf.loc[7, "timestamp"] = math.nan
        if ep % 20 == 7:
            pdf.at[4, "action"] = np.zeros(5, dtype=np.float32)
        if ep % 20 == 11:
            pdf.loc[[2, 3], "frame_index"] = [3, 2]
        meta_rows.append(
            {
                "episode_index": ep,
                "tasks": ["pick cube place box"],
                "length": len(pdf) + (5 if ep % 20 == 13 else 0),
            }
        )
        pdf.to_parquet(os.path.join(data_dir, f"episode_{ep:06d}.parquet"), index=False)

    for ep in range(n_episodes):
        chunk = f"chunk-{ep // episodes_per_chunk:03d}"
        for cam in ("cam_front", "cam_wrist"):
            if ep % 20 in (17, 19) and cam == "cam_wrist":
                continue
            vdir = os.path.join(root, "videos", chunk, cam)
            os.makedirs(vdir, exist_ok=True)
            with open(os.path.join(vdir, f"episode_{ep:06d}.mp4"), "wb") as f:
                f.write(b"\x00fakemp4" * 16)

    meta_dir = os.path.join(root, "meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "episodes.jsonl"), "w") as f:
        for row in meta_rows:
            f.write(json.dumps(row) + "\n")

    _write_stats_sidecar(root, meta_dir)

    with open(marker, "w") as f:
        f.write("ok")
    return root


def _episode_stats(pdf: pd.DataFrame, feature: str) -> dict:
    """TRUE per-dim stats of one episode's (possibly ragged) vectors,
    mirroring posexplode semantics: a width-5 row contributes to dims
    0-4 only; count is the row count (what the max-over-dims count in
    stats_stage.episode_feature_stats resolves to)."""
    dims: dict[int, list[float]] = {}
    for arr in pdf[feature]:
        for d, x in enumerate(arr):
            dims.setdefault(d, []).append(float(x))
    width = max(dims) + 1
    mean = [float(np.mean(dims[d])) for d in range(width)]
    std = [float(np.std(dims[d])) for d in range(width)]  # population
    mn = [float(np.min(dims[d])) for d in range(width)]
    mx = [float(np.max(dims[d])) for d in range(width)]
    return {
        "count": len(pdf),
        "mean": mean,
        "std": std,
        "min": mn,
        "max": mx,
    }


def _write_stats_sidecar(root: str, meta_dir: str) -> None:
    """episodes_stats.jsonl with the heterogeneous shapes real toolchains
    emit (stats_refactored.py:95-135): count as scalar / per-dim list /
    alias keys, rotating per episode — but every VALUE is the exact stat
    of the episode's frames, so sidecar-ingested global stats must equal
    frames-derived ones (tested in tests/test_cli.py)."""
    import glob as _glob

    lines = []
    for fp in sorted(_glob.glob(os.path.join(root, "data", "*", "episode_*.parquet"))):
        pdf = pd.read_parquet(fp)
        ep = int(pdf["episode_index"].iloc[0])
        stats = {}
        for feature in ("action", "observation.state"):
            st = _episode_stats(pdf, feature)
            if ep % 3 == 1:  # count as per-dim list
                st["count"] = [st["count"]] * len(st["mean"])
            elif ep % 3 == 2:  # alias key instead of count
                st["frame_count"] = st.pop("count")
            stats[feature] = st
        lines.append(json.dumps({"episode_index": ep, "stats": stats}))
    with open(os.path.join(meta_dir, "episodes_stats.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
