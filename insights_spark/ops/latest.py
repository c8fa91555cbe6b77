"""Latest-version dedup — THE decorrelation rewrite of the codebase.

The reference expresses "current state of an element" as a correlated
max-per-group subquery (reference advanced-queries.md:129,143-150, variant
without cutoff at :172,178):

    version = (SELECT max(version) FROM osm_element_history i
               WHERE i.type = o.type AND i.id = o.id
                 AND i.timestamp < cutoff)

The engine rewrites it as a window dedup (SURVEY §2.3 J5): one shuffle on
(type, id), rank by version desc, keep row 1 — deterministic, AQE-skew-safe,
and reusable as the as-of primitive for way-geometry reconstruction and
month-end country insights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_version(
    df: DataFrame,
    keys: tuple[str, ...] = ("type", "id"),
    version_col: str = "version",
    cutoff_col: str = "timestamp",
    cutoff=None,
) -> DataFrame:
    """Keep the max-version row per key, optionally as-of a cutoff timestamp.

    `cutoff` may be a literal/Column; rows with cutoff_col >= cutoff are
    excluded BEFORE ranking (strict '<', matching the reference's
    ``timestamp < '{by_month}'``). Pushdown-friendly: the cutoff filter sits
    under the window so Parquet row-group skipping applies.
    """
    if cutoff is not None:
        df = df.filter(F.col(cutoff_col) < cutoff)
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scalar_pick(
    df: DataFrame,
    group_keys: tuple[str, ...],
    value_col: str,
    order_col: str,
) -> DataFrame:
    """J4 — deterministic replacement for correlated ``(SELECT v ... LIMIT 1)``.

    The reference's username lookup (advanced-queries.md:53,73-74) uses
    LIMIT 1 with no ORDER BY — nondeterministic. Engine rule (SURVEY §7):
    the value from the row with MAX(order_col) wins. Returns one row per
    group: (group_keys..., value_col).
    """
    w = Window.partitionBy(*group_keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_keys, value_col)
    )
