"""Spark-SQL surface over the warehouse — the reference user's dialect.

The reference's users write Postgres SQL against `osm_changeset` /
`osm_element_history` (advanced-queries.md). This module registers the
engine's pipeline outputs under those exact view names and ships the
documented reports as Spark SQL, translated mechanically:

    Postgres                      Spark SQL
    --------------------------    ------------------------------------
    (each(osh.tags)).key/.value   LATERAL explode(tags) AS (key, value)
    tags -> 'comment'             tags['comment']
    col ~~ '%pat%'                col LIKE '%pat%'
    IN (subquery on changesets)   LEFT SEMI JOIN (same plan Spark builds)

Each canned query is pytest-pinned equal to its DataFrame twin (the
oracle-checked ops), so the SQL surface and the API surface cannot drift.
Catalyst plans the SQL identically to the DataFrame code — the broadcast
semi-join and partial aggregations appear the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: view name → expected source (pipeline output table or any DataFrame)
WAREHOUSE_VIEWS = ("osm_changeset", "osm_element_history")


def register_warehouse_views(
    spark: SparkSession,
    changesets: DataFrame | str,
    element_history: DataFrame | str,
) -> None:
    """Register the reference's table names as temp views.

    Accepts DataFrames or parquet paths (the pipeline's `tables` dict
    values). Temp views are session-scoped metadata only — no data copy.
    """
    for name, src in (
        ("osm_changeset", changesets),
        ("osm_element_history", element_history),
    ):
        df = spark.read.parquet(src) if isinstance(src, str) else src
        df.createOrReplaceTempView(name)


def mapathon_features_sql(
    start_ts: str, end_ts: str, patterns: list[str]
) -> str:
    """advanced-queries.md:16-30 translated: per (tag key, action) distinct
    feature counts for changesets matching any hashtag pattern in the
    event window. Patterns are LIKE fragments, e.g. 'hotosm-project-11224'."""
    likes = " OR ".join(
        f"(tags['comment'] LIKE '%{p}%' OR tags['hashtags'] LIKE '%{p}%')"
        for p in patterns
    )
    return f"""
        SELECT t.key, t.action, count(DISTINCT t.id) AS features
        FROM (
          SELECT osh.id, osh.action, k.key, k.value
          FROM osm_element_history osh
          LATERAL VIEW explode(osh.tags) k AS key, value
          WHERE osh.changeset IN (
            SELECT c.id FROM osm_changeset c
            WHERE c.created_at BETWEEN '{start_ts}' AND '{end_ts}'
              AND ({likes})
          )
        ) t
        GROUP BY t.key, t.action
    """


def mapathon_contributors_sql(
    start_ts: str, end_ts: str, patterns: list[str]
) -> str:
    """advanced-queries.md:35-47 translated: distinct contributor count for
    the same event scope."""
    likes = " OR ".join(
        f"(tags['comment'] LIKE '%{p}%' OR tags['hashtags'] LIKE '%{p}%')"
        for p in patterns
    )
    return f"""
        SELECT count(DISTINCT osh.uid) AS total_contributors
        FROM osm_element_history osh
        WHERE osh.changeset IN (
          SELECT c.id FROM osm_changeset c
          WHERE c.created_at BETWEEN '{start_ts}' AND '{end_ts}'
            AND ({likes})
        )
    """
