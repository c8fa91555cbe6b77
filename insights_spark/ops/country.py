"""Country-level building insights (A10) + mapathon report queries.

Reference: advanced-queries.md:137-155 — per (country, month-end) count of
distinct building way/relation ids in their latest version strictly before
the month timestamp; the TM variant additionally requires the element's
changeset to be a hot (hotosm) changeset. The reference runs one correlated
UPDATE per country per year; the engine computes every (country, month)
pair in one DAG per month-end (or a small loop over month-ends, each a
single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .latest import latest_version
from .tags import tag_exists


def building_counts_asof(
    elements: DataFrame,
    by_month,
    hot_changeset_ids: DataFrame | None = None,
) -> DataFrame:
    """(country, building_count[, tm_building_count]) as-of one timestamp.

    Semantics pinned to the reference: latest version per (type,id) is
    computed over ALL rows with timestamp < by_month (no tag/country filter
    inside the max()), THEN the building/type/country predicates apply to
    that latest row.
    """
    latest = latest_version(elements, ("type", "id"), cutoff=F.lit(by_month))
    b = latest.filter(
        tag_exists(F.col("tags"), "building")
        & F.col("type").isin("way", "relation")
        & F.col("country").isNotNull()
    )
    out = b.groupBy("country").agg(F.countDistinct("id").alias("building_count"))
    if hot_changeset_ids is not None:
        tm = (
            b.join(
                F.broadcast(hot_changeset_ids.select(F.col("id").alias("changeset"))),
                "changeset",
                "left_semi",
            )
            .groupBy("country")
            .agg(F.countDistinct("id").alias("tm_building_count"))
        )
        out = out.join(tm, "country", "left").na.fill({"tm_building_count": 0})
    return out.withColumn("by_month", F.lit(by_month).cast("timestamp_ntz"))


def country_insights(
    elements: DataFrame,
    months: list,
    hot_changeset_ids: DataFrame | None = None,
) -> DataFrame:
    """The full country_insights table: one row per (country, by_month).

    The reference runs one correlated UPDATE per country per year
    (advanced-queries.md:130-155); the engine unions one as-of snapshot per
    month-end — each snapshot is a single shuffle, and months are
    independent jobs a scheduler can run in parallel. (A single-DAG variant
    would explode elements × months before the window; at 100 TB the
    per-month loop is the cheaper plan because the as-of filter prunes the
    scan to timestamp < month, which Parquet skips on.)
    """
    if not months:
        raise ValueError("country_insights requires at least one month-end")
    out = None
    for m in months:
        snap = building_counts_asof(elements, m, hot_changeset_ids)
        out = snap if out is None else out.unionByName(snap)
    return out


def mapathon_tag_action_report(
    elements: DataFrame, changeset_ids: DataFrame
) -> DataFrame:
    """advanced-queries.md:19-30 — per (tag key, action) counts for the
    changesets of one mapathon: semi-join elements ⋉ filtered changesets
    (J1), explode tags (P8), groupBy key+action (A4)."""
    scoped = elements.join(
        F.broadcast(changeset_ids.select(F.col("id").alias("changeset"))),
        "changeset",
        "left_semi",
    )
    return (
        scoped.select("id", "action", F.explode("tags").alias("key", "value"))
        .groupBy("key", "action")
        .agg(F.countDistinct("id").alias("features"))
    )


def mapathon_contributors(
    changesets: DataFrame, elements: DataFrame, changeset_ids: DataFrame
) -> DataFrame:
    """advanced-queries.md:35-47 — distinct contributor count over the
    mapathon's elements."""
    scoped = elements.join(
        F.broadcast(changeset_ids.select(F.col("id").alias("changeset"))),
        "changeset",
        "left_semi",
    )
    return scoped.agg(F.countDistinct("uid").alias("contributors"))
