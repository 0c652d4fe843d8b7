"""Orchestration parity tests (reference airflow/dags/neura_pipeline_dag.py).

Import-free DAG-shape checks on the shared task spec, runner guardrail
semantics with injected clocks/runners, and one real five-stage run.
"""

from __future__ import annotations

import json
import os

import pytest

from imitation_learning_data_pipeline_spark.orchestration import (
    DAGRUN_TIMEOUT_S,
    DEFAULT_RETRIES,
    DEFAULT_RETRY_DELAY_S,
    MAX_ACTIVE_RUNS,
    PipelineTask,
    pipeline_tasks,
    run_pipeline,
    toposort,
)

CHAIN = ["discover", "validate", "stats", "align_transform", "materialize"]


class TestDagShape:
    def test_linear_chain_matches_reference(self):
        """discover >> validate >> stats >> align_transform >> materialize
        (neura_pipeline_dag.py:135)."""
        tasks = pipeline_tasks("/data", "/app/output")
        assert [t.task_id for t in tasks] == CHAIN
        assert tasks[0].upstream == ()
        for prev, t in zip(tasks, tasks[1:]):
            assert t.upstream == (prev.task_id,)

    def test_retry_and_timeout_defaults(self):
        """default_args retries=2 / retry_delay=3min; dagrun_timeout=4h;
        max_active_runs=1 (neura_pipeline_dag.py:27-42)."""
        assert DEFAULT_RETRIES == 2
        assert DEFAULT_RETRY_DELAY_S == 180.0
        assert DAGRUN_TIMEOUT_S == 4 * 3600
        assert MAX_ACTIVE_RUNS == 1
        for t in pipeline_tasks("/d", "/w"):
            assert t.retries == 2

    def test_validate_task_mirrors_reference_dag(self):
        """validate runs in the media (ffprobe) image with --skip-video
        by default (:67-78) and treats data-failures as task success."""
        tasks = {t.task_id: t for t in pipeline_tasks("/d", "/w")}
        v = tasks["validate"]
        assert v.image == "media"
        assert "--skip-video" in v.argv
        assert v.ok_codes == (0, 1)
        assert all(t.image == "base" for i, t in tasks.items() if i != "validate")
        no_skip = {t.task_id: t for t in pipeline_tasks("/d", "/w", skip_video=False)}
        assert "--skip-video" not in no_skip["validate"].argv

    def test_stage_wiring_paths(self):
        """Stage N consumes stage N-1's artifact exactly like the
        reference DAG's WORK_ROOT layout (:20-25, 52-135)."""
        tasks = {t.task_id: t for t in pipeline_tasks("/data", "/work")}
        manifest = "/work/manifest/episodes.parquet"
        assert manifest in tasks["discover"].argv
        assert manifest in tasks["validate"].argv
        assert "/work/validation/validated_episodes.jsonl" in tasks["stats"].argv
        assert "/work/stats/global_stats.json" in tasks["stats"].argv
        assert "/work/stats/global_stats.json" in tasks["align_transform"].argv
        assert "/work/normalized" in tasks["align_transform"].argv
        assert "/work/normalized" in tasks["materialize"].argv
        assert "/work/dataset" in tasks["materialize"].argv

    def test_every_argv_parses_against_the_cli(self):
        """The DAG's commands must stay valid as the CLI evolves — parse
        each one with the real argparse tree."""
        from imitation_learning_data_pipeline_spark.cli import build_parser

        parser = build_parser()
        for t in pipeline_tasks("/data", "/work"):
            ns = parser.parse_args(list(t.argv))
            assert callable(ns.fn)

    def test_toposort_cycle_and_unknown_detection(self):
        with pytest.raises(ValueError, match="cycle"):
            toposort(
                [
                    PipelineTask("a", ("discover",), upstream=("b",)),
                    PipelineTask("b", ("discover",), upstream=("a",)),
                ]
            )
        with pytest.raises(ValueError, match="unknown upstream"):
            toposort([PipelineTask("a", ("discover",), upstream=("ghost",))])

    def test_airflow_module_imports_without_airflow(self):
        import importlib.util

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "airflow_dag",
            "imitation_learning_data_pipeline_spark_dag.py",
        )
        spec = importlib.util.spec_from_file_location("pipeline_dag", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "AIRFLOW_AVAILABLE")
        assert callable(mod.build_dag)


class TestRunnerGuardrails:
    """Retry/ordering/timeout semantics with injected runner + clock."""

    def _tasks(self):
        return [
            PipelineTask("a", ("discover",), retry_delay_s=0),
            PipelineTask("b", ("validate",), upstream=("a",), retry_delay_s=0, ok_codes=(0, 1)),
            PipelineTask("c", ("stats",), upstream=("b",), retry_delay_s=0),
        ]

    def test_happy_path_runs_in_order(self):
        calls = []
        res = run_pipeline(
            "/d", "/w", runner=lambda argv: calls.append(argv[0]) or 0,
            tasks=self._tasks(),
        )
        assert res.ok
        assert calls == ["discover", "validate", "stats"]
        assert res.statuses == {"a": "success", "b": "success", "c": "success"}
        assert res.attempts == {"a": 1, "b": 1, "c": 1}

    def test_flaky_task_retries_with_delay(self):
        fails = {"n": 0}
        sleeps = []

        def runner(argv):
            if argv[0] == "discover" and fails["n"] < 2:
                fails["n"] += 1
                return 7
            return 0

        res = run_pipeline(
            "/d", "/w", runner=runner, tasks=self._tasks(),
            retry_delay_override_s=9.5, sleep=sleeps.append,
        )
        assert res.ok
        assert res.attempts["a"] == 3  # 1 + retries(2), like Airflow
        assert sleeps == [9.5, 9.5]

    def test_exhausted_retries_fail_downstream(self):
        res = run_pipeline(
            "/d", "/w",
            runner=lambda argv: 3 if argv[0] == "validate" else 0,
            tasks=self._tasks(),
        )
        assert not res.ok
        assert res.statuses == {
            "a": "success", "b": "failed", "c": "upstream_failed"
        }
        assert res.attempts["b"] == 3

    def test_crashing_stage_is_retried_not_propagated(self):
        def runner(argv):
            raise RuntimeError("boom")

        res = run_pipeline("/d", "/w", runner=runner, tasks=self._tasks())
        assert not res.ok
        assert res.statuses["a"] == "failed" and res.attempts["a"] == 3

    def test_data_failure_exit_code_is_success_for_validate(self):
        res = run_pipeline(
            "/d", "/w",
            runner=lambda argv: 1 if argv[0] == "validate" else 0,
            tasks=self._tasks(),
        )
        assert res.ok and res.statuses["b"] == "success"

    def test_dagrun_timeout_aborts_remaining(self):
        t = {"now": 0.0}

        def clock():
            t["now"] += 8000.0  # every check advances ~2.2 h
            return t["now"]

        res = run_pipeline(
            "/d", "/w", runner=lambda argv: 0, tasks=self._tasks(),
            timeout_s=DAGRUN_TIMEOUT_S, clock=clock,
        )
        assert not res.ok
        assert "timed_out" in res.statuses.values()
        assert list(res.statuses.values()).count("success") < 3


def test_real_five_stage_run(spark, tmp_path, capsys):
    """The no-Airflow runner drives the real CLI end-to-end on a
    synthetic tree — the DAG's semantics, no scheduler required."""
    from imitation_learning_data_pipeline_spark.pipeline.synthetic import (
        ensure_lerobot_tree,
    )

    root = ensure_lerobot_tree(str(tmp_path / "tree"), n_episodes=12)
    work = str(tmp_path / "work")
    res = run_pipeline(root, work, retry_delay_override_s=0.0)
    capsys.readouterr()  # drain stage stdout
    assert res.ok, res.statuses
    assert [*res.statuses] == CHAIN
    assert os.path.isdir(f"{work}/manifest/episodes.parquet")
    assert os.path.exists(f"{work}/validation/summary.yaml")
    doc = json.load(open(f"{work}/stats/global_stats.json"))
    assert "action" in doc
    assert os.path.isdir(f"{work}/dataset/data")
    splits = {d for d in os.listdir(f"{work}/dataset/data") if d.startswith("split=")}
    assert "split=train" in splits


class TestSnapshotPinTask:
    def test_pin_task_wiring_and_parse(self):
        from imitation_learning_data_pipeline_spark.cli import build_parser
        from imitation_learning_data_pipeline_spark.orchestration import (
            pipeline_tasks,
            toposort,
        )

        parser = build_parser()
        # pin alone: downstream of materialize
        tasks = pipeline_tasks("/data", "/work", snapshot_tag="run-1")
        by_id = {t.task_id: t for t in tasks}
        assert by_id["snapshot_pin"].upstream == ("materialize",)
        # with maintenance: downstream of compact (a pre-compaction pin
        # would force the whole table into the retained tree)
        tasks = pipeline_tasks(
            "/data", "/work", maintenance=True, snapshot_tag="run-1"
        )
        by_id = {t.task_id: t for t in tasks}
        assert by_id["snapshot_pin"].upstream == ("compact",)
        assert toposort(tasks)[-1].task_id == "snapshot_pin"
        for t in tasks:
            ns = parser.parse_args(list(t.argv))
            assert callable(ns.fn)
        # no tag → no task
        assert "snapshot_pin" not in {
            t.task_id for t in pipeline_tasks("/data", "/work")
        }
