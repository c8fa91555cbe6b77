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

import numpy as np
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


def knn_cell_local(
    points: DataFrame,
    k: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 6,
    rings: int = 1,
) -> DataFrame:
    """Cell-local kNN: hex-bin points, replicate each point into its k-ring
    neighborhood, group by home cell, solve locally with numpy.

    Replication factor is |ring(rings)| (7 for rings=1) on the *candidate*
    side only; query points are not replicated. Shuffle key = cell id, so
    hot cells can be salted upstream if a single cell exceeds a partition.
    """
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    ).withColumn("home_cell", cells.hex_udf(res)(F.col("lon"), F.col("lat")))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def ring_udf(col: pd.Series) -> pd.Series:
        return col.map(lambda c: cells.hex_ring_ids(int(c), rings) if pd.notna(c) else [])
    # candidates: each point contributes to every cell in its k-ring
    cand = pts.withColumn("cell", F.explode(ring_udf(F.col("home_cell").cast("long")))).select(
        F.col("cell"), F.col("id").alias("cid"), F.col("lon").alias("clon"),
        F.col("lat").alias("clat"),
    )
    queries = pts.select(
        F.col("home_cell").alias("cell"), "id", "lon", "lat"
    ).withColumn("cid", F.lit(None).cast("long")) \
     .withColumn("clon", F.lit(None).cast("double")) \
     .withColumn("clat", F.lit(None).cast("double"))

    unioned = queries.select("cell", "id", "lon", "lat", "cid", "clon", "clat").unionByName(
        cand.select("cell", F.lit(None).cast("long").alias("id"),
                    F.lit(None).cast("double").alias("lon"),
                    F.lit(None).cast("double").alias("lat"),
                    "cid", "clon", "clat")
    )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist2", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )

    def solve(key, pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["id"].notna()]
        c = pdf[pdf["cid"].notna()]
        if q.empty or c.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        qx = q["lon"].to_numpy(np.float64)
        qy = q["lat"].to_numpy(np.float64)
        qid = q["id"].to_numpy(np.int64)
        cx = c["clon"].to_numpy(np.float64)
        cy = c["clat"].to_numpy(np.float64)
        cid = c["cid"].to_numpy(np.int64)
        d2 = (qx[:, None] - cx[None, :]) ** 2 + (qy[:, None] - cy[None, :]) ** 2
        d2[qid[:, None] == cid[None, :]] = np.inf  # exclude self
        kk = min(k, d2.shape[1])
        rows = []
        for r in range(d2.shape[0]):
            # deterministic order: (dist2, neighbor_id)
            order = np.lexsort((cid, d2[r]))[:kk]
            finite = d2[r][order] < np.inf
            order = order[finite]
            for rank, j in enumerate(order, 1):
                rows.append((qid[r], cid[j], d2[r][j], rank))
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return unioned.groupBy("cell").applyInPandas(solve, out_schema)
