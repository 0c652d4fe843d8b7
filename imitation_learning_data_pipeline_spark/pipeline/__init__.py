"""The reference's five ETL stages as composable DataFrame transformations.

Reference (all citations into /root/reference):
  discover    — steps/discover_refactored.py:79-170
  validate    — steps/validate_from_manifest_refactored.py:24-114 +
                validate/validate_one.py:63-147
  stats       — steps/stats_refactored.py:139-216
  align       — steps/align_transform_refactored.py:82-160
  materialize — steps/materialize_refactored.py:57-154

Design (SURVEY §7.1): each stage is a function DataFrame → DataFrame (or
→ write) over ONE frames DataFrame covering *all* episodes at once — the
reference's per-episode Python loops disappear into Spark task
parallelism, which is the single biggest win of the rebuild.
"""

from .align import align_transform
from .discover import discover
from .materialize import materialize
from .stats_ingest import read_episode_stats_jsonl
from .stats_stage import combine_global_stats, episode_feature_stats
from .validate import validate_episodes

__all__ = [
    "align_transform",
    "combine_global_stats",
    "discover",
    "episode_feature_stats",
    "materialize",
    "read_episode_stats_jsonl",
    "validate_episodes",
]
