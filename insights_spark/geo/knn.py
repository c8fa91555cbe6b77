"""k-nearest-neighbor over point sets (changeset centroids).

North-rule operator (SURVEY §2.11). Two physical strategies:

- ``knn_exact``: brute-force top-k — the correctness baseline and the
  DuckDB-oracle-matchable path. Implemented as a broadcast nested-loop
  join (small neighbor set broadcast to the fact side) + window top-k.
  Distance = squared planar lon/lat distance, ties broken by neighbor id —
  fully deterministic, identical arithmetic in ANSI SQL.

- ``knn_cell_local``: the 100 TB path — points are hex-cell keyed, each
  cell + its k-ring neighborhood is processed locally with numpy
  (`applyInPandas` per cell group). One shuffle on cell id; no O(n²)
  blow-up. Exact whenever the true k neighbors lie within `rings` hex
  rings of the query point (ring radius is chosen from k and point
  density; the pytest suite cross-checks against brute force).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import cells


def knn_exact(
    points: DataFrame,
    k: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Exact kNN: for each point, its k nearest neighbors (excluding self).

    Output: (id, neighbor_id, dist2, rank). Broadcast hash join — valid when
    the neighbor set fits in executor memory; for self-kNN over a huge set
    use ``knn_cell_local``.
    """
    nb = (neighbors or points).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(lon_col).alias("_nlon"),
        F.col(lat_col).alias("_nlat"),
    )
    q = points.select(
        F.col(id_col).alias("id"), F.col(lon_col).alias("_qlon"),
        F.col(lat_col).alias("_qlat"),
    )
    joined = q.join(F.broadcast(nb), F.col("id") != F.col("neighbor_id"))
    d2 = (F.col("_qlon") - F.col("_nlon")) ** 2 + (F.col("_qlat") - F.col("_nlat")) ** 2
    w = Window.partitionBy("id").orderBy(F.asc("dist2"), F.asc("neighbor_id"))
    return (
        joined.withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "dist2", "rank")
    )


def _cell_pairs(queries, candidates, res: int, rings: int):
    """(id, neighbor_id, dist2) pairs within `rings` hex rings at `res`."""
    from pyspark.sql.functions import pandas_udf

    q = queries.withColumn("cell", cells.hex_udf(res)(F.col("lon"), F.col("lat")))

    @pandas_udf("array<long>")
    def ring_udf(col: pd.Series) -> pd.Series:
        return col.map(lambda c: cells.hex_ring_ids(int(c), rings) if pd.notna(c) else [])

    if candidates is queries:
        # self-kNN: encode once, persist — the query and candidate branches
        # would otherwise each run the cell UDF over every point
        q = q.persist()
        cand_cells = q.withColumn("home_cell", F.col("cell"))
    else:
        cand_cells = candidates.withColumn(
            "home_cell", cells.hex_udf(res)(F.col("lon"), F.col("lat"))
        )
    cand = cand_cells.select(
        F.explode(ring_udf(F.col("home_cell").cast("long"))).alias("cell"),
        F.col("id").alias("neighbor_id"),
        F.col("lon").alias("_nlon"),
        F.col("lat").alias("_nlat"),
    )
    joined = q.select("cell", "id", "lon", "lat").join(cand, "cell").filter(
        F.col("id") != F.col("neighbor_id")
    )
    d2 = (F.col("lon") - F.col("_nlon")) ** 2 + (F.col("lat") - F.col("_nlat")) ** 2
    return joined.withColumn("dist2", d2).select("id", "neighbor_id", "dist2")


def knn_cell_local(
    points: DataFrame,
    k: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 6,
    rings: int = 1,
    escalate_res: int | None = None,
    escalate_rings: int | None = None,
) -> DataFrame:
    """Cell-local kNN: hex-bin points, replicate candidates into their
    k-ring, equi-join queries to candidates on cell id, window top-k.

    Pure JVM after the cell/ring encoding (one Arrow-batch pass) — no
    per-group Python, so sparse cells cost nothing and dense cells are a
    plain shuffle key AQE can split. Pair count = Σ_cell q_c × cand_c
    (ring-bounded), never all-pairs. Exact whenever the true k neighbors
    lie within `rings` hex rings.

    `escalate_res`: optional coarser resolution for the SECOND pass —
    queries that found fewer than k neighbors in the first pass re-run
    against the coarse-cell neighborhood (sparse-region completeness). The
    second pass only carries the short queries, so dense regions pay
    nothing; results merge and re-rank deterministically.
    """
    from pyspark.sql.window import Window

    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    pairs = _cell_pairs(pts, pts, res, rings)

    if escalate_res is not None:
        # pairs feeds the shortfall probe AND the union — persist, or the
        # whole first-pass join runs twice
        pairs = pairs.persist()
        found = pairs.groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
        short = (
            pts.join(found, "id", "left")
            .filter(F.col("_n").isNull() | (F.col("_n") < k))
            .select("id", "lon", "lat")
        )
        extra = _cell_pairs(short, pts, escalate_res,
                            escalate_rings if escalate_rings is not None else rings * 4)
        pairs = pairs.unionByName(extra).dropDuplicates(["id", "neighbor_id"])

    w = Window.partitionBy("id").orderBy(F.asc("dist2"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "neighbor_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )
