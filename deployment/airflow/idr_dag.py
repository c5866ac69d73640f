"""Airflow DAG for the PySpark identity-resolution engine.

≙ the reference's orchestration recipe (``deployment/airflow/idr_dag.py``):
dry-run first, gate the live run on the proposed diff (bounded churn + bounded
largest cluster), then INCR via spark-submit, then export metrics. Re-expressed
for a Spark cluster: each task is ``spark-submit --py-files`` against the
packaged engine (north rule packaging), reading the dry-run gate from the
engine's versioned catalog instead of a DuckDB file.

Customize SPARK_SUBMIT / IDR_ZIP / CONFIG / WAREHOUSE for your environment.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.bash import BashOperator
from airflow.operators.python import BranchPythonOperator
from airflow.utils.trigger_rule import TriggerRule

IDR_ZIP = "/opt/idr/idr.zip"  # built by `make zip` (build_pyfiles.py)
IDR_MAIN = "/opt/idr/idr_main.py"  # launcher app file, built alongside the zip
CONFIG = "/opt/idr/pipeline.json"  # plans/cli.py config (or metadata_samples CSV dir)
WAREHOUSE = "/data/idr_warehouse"  # EngineConfig.warehouse (catalog root)
# spark-submit takes an application FILE (it has no `python -m` option);
# idr_main.py imports the packaged CLI from the zip on --py-files.
SPARK_SUBMIT = (
    "spark-submit --deploy-mode cluster "
    f"--py-files {IDR_ZIP} "
    "--conf spark.sql.adaptive.enabled=true "
    f"{IDR_MAIN} --config {CONFIG}"
)
ALERT_EMAIL = "alerts@company.com"

# dry-run gate thresholds (≙ reference check_dry_run_results)
MAX_MOVED = 10_000
MAX_CLUSTER = 50_000

default_args = {
    "owner": "data-team",
    "depends_on_past": False,
    "email": [ALERT_EMAIL],
    "email_on_failure": True,
    "retries": 2,
    "retry_delay": timedelta(minutes=5),
    "execution_timeout": timedelta(hours=2),
}


def check_dry_run_results(**context):
    """Gate the live run on the dry-run diff: too much churn or a runaway
    proposed cluster ⇒ skip and alert (a degenerate blocking key shows up
    here BEFORE it reaches production membership)."""
    import json
    import os

    ptr = os.path.join(WAREHOUSE, "dry_run_summary", "_CURRENT")
    if not os.path.exists(ptr):
        return "skip_live_run"
    import pyarrow.parquet as pq

    meta = json.load(open(ptr))
    parts = meta.get("parts") or [meta["version"]]
    rows = pq.read_table(os.path.join(WAREHOUSE, "dry_run_summary", parts[-1])).to_pylist()
    if not rows:
        return "skip_live_run"
    latest = rows[-1]
    if latest["moved_entities"] > MAX_MOVED:
        return "skip_live_run"
    if latest["largest_proposed_cluster"] > MAX_CLUSTER:
        return "skip_live_run"
    return "run_incremental"


with DAG(
    dag_id="idr_pipeline",
    default_args=default_args,
    description="Identity resolution: dry-run gate -> INCR -> metrics export",
    schedule_interval="0 2 * * *",
    start_date=datetime(2026, 1, 1),
    catchup=False,
    tags=["identity-resolution", "spark"],
) as dag:
    dry_run = BashOperator(
        task_id="dry_run",
        bash_command=f"{SPARK_SUBMIT} --mode INCR --dry-run",
    )

    gate = BranchPythonOperator(
        task_id="check_dry_run",
        python_callable=check_dry_run_results,
    )

    run_incremental = BashOperator(
        task_id="run_incremental",
        bash_command=f"{SPARK_SUBMIT} --mode INCR",
    )

    skip_live_run = BashOperator(
        task_id="skip_live_run",
        bash_command="echo 'dry-run gate failed: live run skipped' >&2; exit 0",
    )

    export_metrics = BashOperator(
        task_id="export_metrics",
        bash_command=(
            "python -c 'from sql_identity_resolution_spark.plans.exporter import export_prometheus; "
            "from sql_identity_resolution_spark.sources.catalog import Catalog; "
            "from sql_identity_resolution_spark.session import build_session; "
            f'print(export_prometheus(Catalog(build_session(), "{WAREHOUSE}")))\' '
            "> /var/lib/node_exporter/idr.prom"
        ),
        trigger_rule=TriggerRule.NONE_FAILED_MIN_ONE_SUCCESS,
    )

    dry_run >> gate >> [run_incremental, skip_live_run]
    run_incremental >> export_metrics
