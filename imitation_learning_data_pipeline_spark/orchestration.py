"""Orchestration parity: the reference's Airflow DAG as a declarative
task spec + a dependency-free runner.

Reference: airflow/dags/neura_pipeline_dag.py:27-135 — five
DockerOperator tasks (discover >> validate >> stats >> align_transform
>> materialize) with retries=2, retry_delay=3 min, dagrun_timeout=4 h,
max_active_runs=1. Here the SAME graph/retry/timeout semantics are a
plain-Python spec (`pipeline_tasks`) consumed by two frontends:

* `run_pipeline` — a standalone runner (no Airflow install needed) that
  executes each task via the in-process CLI with per-task retries,
  retry delay, and a whole-run deadline;
* `airflow_dag/imitation_learning_data_pipeline_spark_dag.py` — builds real
  Airflow operators from this spec when Airflow is importable.

The reference runs each stage in a Docker image (base vs ffprobe-enabled
media image for validate); the `image` field carries that intent so a
containerized deployment can map it back to pod/executor images.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

# DAG-level knobs (neura_pipeline_dag.py:27-42)
DEFAULT_RETRIES = 2
DEFAULT_RETRY_DELAY_S = 180.0  # timedelta(minutes=3)
DAGRUN_TIMEOUT_S = 4 * 3600.0  # dagrun_timeout=timedelta(hours=4)
MAX_ACTIVE_RUNS = 1
DAG_ID = "imitation_learning_data_pipeline_spark"

IMAGE_BASE = "base"  # IMAGE_BASE — plain stage image
IMAGE_MEDIA = "media"  # IMAGE_MEDIA — ffprobe-enabled (validate)


@dataclass(frozen=True)
class PipelineTask:
    task_id: str
    argv: tuple[str, ...]
    upstream: tuple[str, ...] = ()
    retries: int = DEFAULT_RETRIES
    retry_delay_s: float = DEFAULT_RETRY_DELAY_S
    image: str = IMAGE_BASE
    # Exit codes that count as success. validate exits 1 when episodes
    # fail their checks — a DATA outcome the reference surfaces in the
    # summary without failing the DAG task (scripts/neura.py:91-105
    # echoes and exits 0); downstream stats consumes validated-ids.
    ok_codes: tuple[int, ...] = (0,)


def pipeline_tasks(
    data_root: str,
    work_root: str,
    skip_video: bool = True,
    link_videos: str = "symlink",
    maintenance: bool = False,
    expectations_rules: str | None = None,
    snapshot_tag: str | None = None,
) -> list[PipelineTask]:
    """The five-stage chain with the reference DAG's wiring
    (neura_pipeline_dag.py:52-135; path layout :20-25)."""
    manifest = f"{work_root}/manifest/episodes.parquet"
    valid_out = f"{work_root}/validation"
    stats_out = f"{work_root}/stats/global_stats.json"
    norm_out = f"{work_root}/normalized"
    dataset_out = f"{work_root}/dataset"

    validate_argv = [
        "validate",
        "--manifest", manifest,
        "--data-root", data_root,
        "--meta-dir", f"{data_root}/meta",
        "--out", valid_out,
    ]
    if skip_video:  # the reference DAG passes --skip-video (:78)
        validate_argv.append("--skip-video")

    return [
        PipelineTask(
            "discover",
            ("discover", "--data-root", data_root, "--manifest", manifest),
        ),
        PipelineTask(
            "validate",
            tuple(validate_argv),
            upstream=("discover",),
            image=IMAGE_MEDIA,
            ok_codes=(0, 1),
        ),
        PipelineTask(
            "stats",
            (
                "stats",
                "--data-root", data_root,
                "--validated-ids", f"{valid_out}/validated_episodes.jsonl",
                "--out", stats_out,
            ),
            upstream=("validate",),
        ),
        PipelineTask(
            "align_transform",
            (
                "align-transform",
                "--data-root", data_root,
                "--out", norm_out,
                "--stats", stats_out,
            ),
            upstream=("stats",),
        ),
        PipelineTask(
            "materialize",
            (
                "materialize",
                "--norm-dir", norm_out,
                "--out", dataset_out,
                "--videos-root", f"{data_root}/videos",
                "--link-videos", link_videos,
            ),
            upstream=("align_transform",),
        ),
    ] + (
        [
            # declarative data-quality gate after materialize: a failing
            # rule set exits 1 and (unlike validate's data-outcome exit)
            # FAILS the task, blocking any downstream maintenance on a
            # bad dataset — the ingest-gate shape (cli expect).
            PipelineTask(
                "expect_gate",
                (
                    "expect",
                    "--path", f"{dataset_out}/data",
                    "--rules", expectations_rules,
                    "--fail-on-violation",
                ),
                upstream=("materialize",),
            )
        ]
        if expectations_rules
        else []
    ) + (
        [
            # layout maintenance a continuously-scheduled pipeline runs
            # after each materialize: per-episode micro-writes sprawl
            # into small files; compaction rewrites each split partition
            # into target-sized files (pipeline/compact.py). Downstream
            # of the quality gate when one is configured — no point
            # optimizing a dataset the gate just rejected.
            PipelineTask(
                "compact",
                (
                    "compact",
                    "--path", f"{dataset_out}/data",
                    # BOTH levels of materialize's split=/chunk= layout
                    # — naming only the outer level would flatten chunk=
                    # into a data column on rewrite
                    "--partition-col", "split,chunk",
                ),
                upstream=(
                    ("expect_gate",) if expectations_rules else ("materialize",)
                ),
            )
        ]
        if maintenance
        else []
    ) + (
        [
            # reproducibility pin: after everything that rewrites the
            # dataset (compact included — a pin taken before compaction
            # would immediately force the whole table into the retained
            # tree), record a snapshot manifest so THIS run's training
            # inputs stay time-travel-readable forever
            # (pipeline/snapshot.py). Tag convention: the run id.
            PipelineTask(
                "snapshot_pin",
                (
                    "snapshot",
                    "--path", f"{dataset_out}/data",
                    "--create", snapshot_tag,
                ),
                upstream=(
                    ("compact",)
                    if maintenance
                    else ("expect_gate",)
                    if expectations_rules
                    else ("materialize",)
                ),
            )
        ]
        if snapshot_tag
        else []
    )


def toposort(tasks: list[PipelineTask]) -> list[PipelineTask]:
    """Dependency-respecting execution order (stable for the linear
    chain; general for any DAG extension)."""
    by_id = {t.task_id: t for t in tasks}
    for t in tasks:
        unknown = set(t.upstream) - set(by_id)
        if unknown:
            raise ValueError(f"{t.task_id}: unknown upstream {sorted(unknown)}")
    done: list[str] = []
    ordered: list[PipelineTask] = []
    pending = list(tasks)
    while pending:
        ready = [t for t in pending if all(u in done for u in t.upstream)]
        if not ready:
            raise ValueError(f"dependency cycle among {[t.task_id for t in pending]}")
        for t in ready:
            ordered.append(t)
            done.append(t.task_id)
            pending.remove(t)
    return ordered


@dataclass
class RunResult:
    ok: bool
    statuses: dict[str, str] = field(default_factory=dict)  # task_id → state
    attempts: dict[str, int] = field(default_factory=dict)


def run_pipeline(
    data_root: str,
    work_root: str,
    runner=None,
    tasks: list[PipelineTask] | None = None,
    timeout_s: float = DAGRUN_TIMEOUT_S,
    retry_delay_override_s: float | None = None,
    sleep=time.sleep,
    clock=time.monotonic,
    **task_kwargs,
) -> RunResult:
    """Execute the chain with Airflow-equivalent guardrails.

    ``runner(argv) -> int`` defaults to the in-process CLI. Per task:
    up to 1 + ``retries`` attempts with ``retry_delay_s`` between
    (default_args retries/retry_delay); a failed task (after retries)
    marks every downstream task upstream_failed and the run failed; the
    whole run aborts once ``timeout_s`` elapses (dagrun_timeout).
    ``sleep``/``clock`` are injectable for tests.
    """
    if runner is None:
        from .cli import main as runner  # noqa: PLC0415

    tasks = tasks if tasks is not None else pipeline_tasks(
        data_root, work_root, **task_kwargs
    )
    ordered = toposort(tasks)
    t0 = clock()
    result = RunResult(ok=True)
    failed: set[str] = set()
    for t in ordered:
        if any(u in failed for u in t.upstream):
            result.statuses[t.task_id] = "upstream_failed"
            failed.add(t.task_id)
            result.ok = False
            continue
        delay = t.retry_delay_s if retry_delay_override_s is None else retry_delay_override_s
        state = "failed"
        attempts = 0
        for attempt in range(1 + t.retries):
            if clock() - t0 > timeout_s:
                state = "timed_out"
                break
            attempts = attempt + 1
            try:
                rc = runner(list(t.argv))
            except Exception:  # noqa: BLE001 — a crashing stage is retryable
                rc = -1
            if rc in t.ok_codes:
                state = "success"
                break
            if attempt < t.retries:
                sleep(delay)
        result.statuses[t.task_id] = state
        result.attempts[t.task_id] = attempts
        if state != "success":
            failed.add(t.task_id)
            result.ok = False
            if state == "timed_out":
                for rest in ordered[ordered.index(t) + 1 :]:
                    result.statuses[rest.task_id] = "skipped_timeout"
                break
    return result
