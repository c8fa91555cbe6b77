"""Per-user helper aggregates — the migrate.sql PL/pgSQL UDF pair (U1/U2).

Both become set-based DataFrame aggregations; the dblink remote call in
``tasks_per_user`` (migrate.sql:1-26) is modeled as a join against a local
`task_history` table (SURVEY §2.3 J10 — the cross-database hop is out of
engine scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tags import tag_get


def tasks_per_user(
    task_history: DataFrame,
    project_ids: list[int],
    start,
    end,
    action_text: str,
) -> DataFrame:
    """U1 — (user_id, task_count): count of task_history rows per user for
    the given projects / window / action (migrate.sql:10-18)."""
    return (
        task_history.filter(
            F.col("project_id").isin(project_ids)
            & (F.col("action_date") >= F.lit(start))
            & (F.col("action_date") <= F.lit(end))
            & (F.col("action_text") == action_text)
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("task_count"))
    )


def editors_per_user(changesets: DataFrame, start, end) -> DataFrame:
    """U2 — (user_id, editors): distinct `created_by` values concatenated
    with a TRAILING comma, matching the reference's cursor loop
    ``v_editors := v_editors || editor || ','`` (migrate.sql:43).

    The reference's cursor order is unspecified (SELECT DISTINCT without
    ORDER BY); the engine pins ascending editor-name order — documented
    deterministic divergence (SURVEY §7).
    """
    return (
        changesets.filter(
            (F.col("created_at") >= F.lit(start))
            & (F.col("created_at") <= F.lit(end))
            & tag_get(F.col("tags"), "created_by").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.concat(
                F.concat_ws(",", F.array_sort(F.collect_set(tag_get(F.col("tags"), "created_by")))),
                F.lit(","),
            ).alias("editors")
        )
    )
