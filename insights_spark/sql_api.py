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
WAREHOUSE_VIEWS = ("osm_changeset", "osm_element_history", "hot_changeset")


def _q(s: str) -> str:
    """SQL string literal escape: double every single quote. Every
    user-supplied fragment (patterns, timestamps) passes through here —
    a pattern containing ' must not break or extend the query."""
    return str(s).replace("'", "''")


def register_warehouse_views(
    spark: SparkSession,
    changesets: DataFrame | str,
    element_history: DataFrame | str,
    hot_changesets: DataFrame | str | None = None,
) -> None:
    """Register the reference's table names as temp views.

    Accepts DataFrames or parquet paths (the pipeline's `tables` dict
    values). Temp views are session-scoped metadata only — no data copy.
    `hot_changesets` (optional) backs the reference's `hot_changeset`
    materialized view used by the country-insights TM column.
    """
    pairs = [
        ("osm_changeset", changesets),
        ("osm_element_history", element_history),
    ]
    if hot_changesets is not None:
        pairs.append(("hot_changeset", hot_changesets))
    for name, src in pairs:
        df = spark.read.parquet(src) if isinstance(src, str) else src
        df.createOrReplaceTempView(name)


def _likes(patterns: list[str]) -> str:
    """The reference's per-pattern comment/hashtags OR chain
    (advanced-queries.md:42-45), quote-escaped."""
    return " OR ".join(
        f"(tags['comment'] LIKE '%{_q(p)}%' OR tags['hashtags'] LIKE '%{_q(p)}%')"
        for p in patterns
    )


def mapathon_features_sql(
    start_ts: str, end_ts: str, patterns: list[str]
) -> str:
    """advanced-queries.md:16-30 translated: per (tag key, action) distinct
    feature counts for changesets matching any hashtag pattern in the
    event window. Patterns are LIKE fragments, e.g. 'hotosm-project-11224'."""
    likes = _likes(patterns)
    start_ts, end_ts = _q(start_ts), _q(end_ts)
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
    likes = _likes(patterns)
    start_ts, end_ts = _q(start_ts), _q(end_ts)
    return f"""
        SELECT count(DISTINCT osh.uid) AS total_contributors
        FROM osm_element_history osh
        WHERE osh.changeset IN (
          SELECT c.id FROM osm_changeset c
          WHERE c.created_at BETWEEN '{start_ts}' AND '{end_ts}'
            AND ({likes})
        )
    """


def mapathon_user_report_sql(
    start_ts: str, end_ts: str, patterns: list[str]
) -> str:
    """advanced-queries.md:48-66 translated: the detailed per-user mapathon
    report — uid | username | key | action | features. The reference's
    correlated ``(SELECT c.user_name ... WHERE c.user_id = t.uid LIMIT 1)``
    has no ORDER BY; the engine's pinned deterministic rule (J4, same as
    ops.country.mapathon_user_report) is max_by(user_name, id): the
    username on the user's highest changeset id wins."""
    likes = _likes(patterns)
    start_ts, end_ts = _q(start_ts), _q(end_ts)
    return f"""
        SELECT t.uid, n.username, t.key, t.action,
               count(DISTINCT t.id) AS features
        FROM (
          SELECT osh.id, osh.uid, osh.action, k.key, k.value
          FROM osm_element_history osh
          LATERAL VIEW explode(osh.tags) k AS key, value
          WHERE osh.changeset IN (
            SELECT c.id FROM osm_changeset c
            WHERE c.created_at BETWEEN '{start_ts}' AND '{end_ts}'
              AND ({likes})
          )
        ) t
        LEFT JOIN (
          SELECT user_id AS uid, max_by(user_name, id) AS username
          FROM osm_changeset GROUP BY user_id
        ) n ON t.uid = n.uid
        GROUP BY t.uid, n.username, t.key, t.action
    """


def country_insights_sql(by_month: str, with_tm: bool = False) -> str:
    """advanced-queries.md:126-155 translated: per-country distinct building
    way/relation count in the latest version strictly before `by_month`
    (the correlated max-version subquery decorrelated to a window dedup —
    same rewrite as ops.latest.latest_version), with the optional
    Tasking-Manager column gated on `changeset IN (SELECT id FROM
    hot_changeset)` applied to the LATEST row's changeset
    (advanced-queries.md:144-150). Register `hot_changeset` via
    register_warehouse_views(..., hot_changesets=...) before using
    with_tm=True. The reference updates one (country, month) cell per
    correlated subquery; this computes every country in one pass."""
    by_month = _q(by_month)
    tm_col = (
        """,
               count(DISTINCT CASE WHEN h.id IS NOT NULL THEN b.id END)
                 AS tm_building_count"""
        if with_tm
        else ""
    )
    tm_join = "LEFT JOIN hot_changeset h ON b.changeset = h.id" if with_tm else ""
    return f"""
        WITH latest AS (
          SELECT * FROM (
            SELECT osh.*, row_number() OVER (PARTITION BY osh.type, osh.id
                       ORDER BY osh.version DESC) AS _rn
            FROM osm_element_history osh
            WHERE osh.timestamp < TIMESTAMP '{by_month}'
          ) WHERE _rn = 1
        ),
        b AS (
          SELECT * FROM latest
          WHERE map_contains_key(tags, 'building')
            AND type IN ('way', 'relation')
            AND country IS NOT NULL
        )
        SELECT b.country, count(DISTINCT b.id) AS building_count{tm_col},
               TIMESTAMP '{by_month}' AS by_month
        FROM b {tm_join}
        GROUP BY b.country
    """
