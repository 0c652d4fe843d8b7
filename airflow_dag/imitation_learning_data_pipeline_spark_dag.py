"""Airflow frontend for the five-stage pipeline spec.

Reference: airflow/dags/neura_pipeline_dag.py — same dag_id semantics,
default_args (retries=2, retry_delay=3 min), schedule (manual),
max_active_runs=1, dagrun_timeout=4 h, and the linear chain
discover >> validate >> stats >> align_transform >> materialize.

The task graph itself lives in
``imitation_learning_data_pipeline_spark.orchestration.pipeline_tasks`` (one source of
truth shared with the no-Airflow runner); this module only binds it to
Airflow operators. The reference launches each stage as a DockerOperator
against a CLI image; here each stage is the same CLI via BashOperator —
swap in DockerOperator/KubernetesPodOperator with the task's ``image``
field (base vs ffprobe-enabled media) for containerized deployments.

Importable without Airflow: the module exposes ``AIRFLOW_AVAILABLE``
and only instantiates the DAG when the scheduler environment exists, so
test collection and linting never require an Airflow install.
"""

from __future__ import annotations

import os
import shlex
from datetime import datetime, timedelta

from imitation_learning_data_pipeline_spark.orchestration import (
    DAG_ID,
    DAGRUN_TIMEOUT_S,
    MAX_ACTIVE_RUNS,
    pipeline_tasks,
)

DATA_ROOT = os.environ.get("PIPELINE_DATA_ROOT", "/data")
WORK_ROOT = os.environ.get("PIPELINE_WORK_ROOT", "/app/output")

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # pragma: no cover — container has no Airflow
    DAG = None
    BashOperator = None


def build_dag():
    """Construct the Airflow DAG (requires Airflow installed)."""
    tasks = pipeline_tasks(DATA_ROOT, WORK_ROOT)
    default_args = {
        "owner": "imitation-learning-data-pipeline-spark",
        "retries": tasks[0].retries,
        "retry_delay": timedelta(seconds=tasks[0].retry_delay_s),
    }
    with DAG(
        dag_id=DAG_ID,
        default_args=default_args,
        start_date=datetime(2025, 1, 1),
        schedule=None,  # trigger manually, like the reference
        catchup=False,
        max_active_runs=MAX_ACTIVE_RUNS,
        tags=["imitation-learning", "data-pipeline", "spark"],
        dagrun_timeout=timedelta(seconds=DAGRUN_TIMEOUT_S),
    ) as dag:
        ops = {
            t.task_id: BashOperator(
                task_id=t.task_id,
                bash_command=(
                    "python -m imitation_learning_data_pipeline_spark.cli "
                    + " ".join(shlex.quote(a) for a in t.argv)
                ),
                retries=t.retries,
                retry_delay=timedelta(seconds=t.retry_delay_s),
                env={"PYTHONUNBUFFERED": "1", **os.environ},
            )
            for t in tasks
        }
        for t in tasks:
            for up in t.upstream:
                ops[up] >> ops[t.task_id]
    return dag


AIRFLOW_AVAILABLE = DAG is not None

if AIRFLOW_AVAILABLE:  # pragma: no cover
    globals()[DAG_ID] = build_dag()
