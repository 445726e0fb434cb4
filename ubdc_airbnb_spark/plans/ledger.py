"""Task ledger: the work-tracking table that replaces Celery's result
backend + the ``before_task_publish`` signal (SURVEY §2.10 T2/T5/T6; ref
app/models.py:629-706, app/signals.py:14-52, app/task_managers.py:31-113,
app/utils/tasks.py:15-56).

State machine: SUBMITTED → STARTED → SUCCESS | FAILURE | RETRY, with
timestamps per transition. All operations are set-based MERGEs on the
ledger DataFrame/table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.jsonutils import json_key_long
from ..operators.upsert import upsert


def submit_tasks(
    work: DataFrame,
    task_name: str,
    kwargs_col: str,
    now_expr: str,
    expires_expr: str | None = None,
    group_size: int = 100,
) -> DataFrame:
    """Create SUBMITTED ledger rows for a batch of work items (the
    publish-time row creation the reference does in a signal — ref
    signals.py:14-52). Task ids are deterministic digests of
    (name, kwargs) so re-submission is idempotent; group ids implement
    the 100-per-group chunking (ref core/settings.py:9)."""
    from ..operators.windows import assign_batches

    rows = work.select(F.col(kwargs_col).alias("task_kwargs"))
    rows = assign_batches(rows, "task_kwargs", group_size)
    return rows.select(
        F.md5(F.concat(F.lit(task_name), F.lit("#"), F.col("task_kwargs"))).alias("task_id"),
        F.lit(task_name).alias("task_name"),
        "task_kwargs",
        F.lit("SUBMITTED").alias("status"),
        F.expr(now_expr).alias("submitted_at"),
        F.lit(None).cast("timestamp").alias("started_at"),
        F.lit(None).cast("timestamp").alias("finished_at"),
        F.lit(0).alias("retries"),
        F.concat(F.lit(task_name), F.lit(":g"), F.col("batch_id").cast("string")).alias(
            "group_task_id"
        ),
        (F.expr(expires_expr) if expires_expr else F.lit(None).cast("timestamp")).alias(
            "expires_at"
        ),
    )


def inflight_keys(
    ledger: DataFrame,
    key: str,
    now_expr: str,
    window_hours: int = 24,
    task_name: str | None = None,
) -> DataFrame:
    """T2: distinct typed keys (listing_id / quadkey) with a task
    submitted inside the dedup window — the anti-join right side (ref
    utils/tasks.py:15-56, incl. the JSON key extraction X8)."""
    df = ledger.filter(
        F.col("submitted_at") >= F.expr(now_expr) - F.make_interval(hours=F.lit(window_hours))
    )
    if task_name:
        df = df.filter(F.col("task_name") == task_name)
    return (
        df.filter(F.get_json_object("task_kwargs", f"$.{key}").isNotNull())
        .select(json_key_long("task_kwargs", key).alias(key))
        .distinct()
    )


def transition(
    ledger: DataFrame,
    task_ids: DataFrame,
    new_status: str,
    now_expr: str,
) -> DataFrame:
    """T6: move a set of tasks to a new state, stamping the transition
    timestamp (started_at on STARTED, finished_at on terminal states;
    retries increment on RETRY — ref task_managers.py:60-113)."""
    ids = task_ids.select("task_id").distinct()
    updated = (
        ledger.join(ids, "task_id", "left_semi")
        .withColumn("status", F.lit(new_status))
        .withColumn(
            "started_at",
            F.when(F.lit(new_status) == "STARTED", F.expr(now_expr)).otherwise(
                F.col("started_at")
            ),
        )
        .withColumn(
            "finished_at",
            F.when(
                F.lit(new_status).isin("SUCCESS", "FAILURE", "REVOKED"), F.expr(now_expr)
            ).otherwise(F.col("finished_at")),
        )
        .withColumn(
            "retries",
            F.when(F.lit(new_status) == "RETRY", F.col("retries") + 1).otherwise(
                F.col("retries")
            ),
        )
    )
    return upsert(ledger, updated, ["task_id"])


def claimable(ledger: DataFrame, now_expr: str, max_retries: int = 2) -> DataFrame:
    """T3/T5: tasks still worth running — not expired, not terminal,
    under the retry budget (ref task_managers.py:24-30: ≤2 retries;
    expiry drop ref operations/grids.py:156-160)."""
    return ledger.filter(
        F.col("status").isin("SUBMITTED", "RETRY")
        & (F.col("expires_at").isNull() | (F.col("expires_at") > F.expr(now_expr)))
        & (F.col("retries") <= max_retries)
    )
