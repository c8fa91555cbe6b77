"""Changeset-bbox operators: centroid, equal-area size filter, cell covers.

Covers SURVEY §2.8 F10/F13/F14 and §2.3 J8/J9 plus the §1.2 physical-design
columns (`h3_cells`/`s2_cells` covers for bbox rows):

- centroid: ST_Centroid of the bbox envelope = midpoint column math
  (advanced-queries.md:251).
- area_km2: the reference filters mega-changesets with
  ``ST_Area(ST_Transform(geom, 3410)) < 225e6`` m² (README.md:77) and warns
  about out-of-range latitudes (README.md:78). Engine: cosine-corrected
  equirectangular area — exact enough for a threshold filter — with lat
  clamped to ±90 first, as the reference's warning demands.
- covered_by: ST_CoveredBy(bbox, envelope) as pure corner comparisons
  (README.md:120-124).
- hot_changesets_with_country: the hot_changeset materialized view's
  centroid-in-polygon enrichment (advanced-queries.md:249-252) using the
  same broadcast PIP kernel as element enrichment (J8 ≡ J6 on centroids).
- bbox_cell_cover: hex cells intersecting the bbox (bounded count) — the
  spatial-index column for bbox rows; joins against point cells prune
  candidate pairs the way GIST did.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_KM_PER_DEG = 111.19492664455873  # mean radius arc length per degree
MEGA_CHANGESET_KM2 = 225.0  # README.md:77 threshold: 225e6 m²


def clamp_lat(lat: Column) -> Column:
    """Out-of-range latitudes exist in real data (README.md:78) — clamp."""
    return F.greatest(F.lit(-90.0), F.least(lat, F.lit(90.0)))


def centroid_lon(min_lon: Column, max_lon: Column) -> Column:
    return (min_lon + max_lon) / 2.0


def centroid_lat(min_lat: Column, max_lat: Column) -> Column:
    return (clamp_lat(min_lat) + clamp_lat(max_lat)) / 2.0


def bbox_area_km2(min_lon: Column, min_lat: Column,
                  max_lon: Column, max_lat: Column) -> Column:
    """Cosine-corrected equirectangular bbox area in km²."""
    lat0 = clamp_lat(min_lat)
    lat1 = clamp_lat(max_lat)
    mid = F.radians((lat0 + lat1) / 2.0)
    w = (max_lon - min_lon) * F.cos(mid) * EARTH_KM_PER_DEG
    h = (lat1 - lat0) * EARTH_KM_PER_DEG
    return F.abs(w * h)


def filter_mega_changesets(changesets: DataFrame,
                           max_km2: float = MEGA_CHANGESET_KM2) -> DataFrame:
    """Drop mega-changesets (F14) — the reference's sanity filter."""
    area = bbox_area_km2(F.col("min_lon"), F.col("min_lat"),
                         F.col("max_lon"), F.col("max_lat"))
    return changesets.filter(F.col("min_lon").isNull() | (area < F.lit(max_km2)))


def covered_by(min_lon: Column, min_lat: Column, max_lon: Column,
               max_lat: Column, env: tuple[float, float, float, float]) -> Column:
    """J9 — bbox fully within an envelope (xmin, ymin, xmax, ymax)."""
    x0, y0, x1, y1 = env
    return (
        (min_lon >= F.lit(x0)) & (max_lon <= F.lit(x1))
        & (min_lat >= F.lit(y0)) & (max_lat <= F.lit(y1))
    )


def with_centroid(changesets: DataFrame) -> DataFrame:
    return changesets.withColumn(
        "centroid_lon", centroid_lon(F.col("min_lon"), F.col("max_lon"))
    ).withColumn("centroid_lat", centroid_lat(F.col("min_lat"), F.col("max_lat")))


def hot_changesets_with_country(changesets: DataFrame,
                                boundary_rows: list[dict]) -> DataFrame:
    """X6/J8 — the hot_changeset materialized view: '%hotosm%' changesets
    with country assigned by centroid-in-polygon (deterministic tie-break,
    replacing the reference's LIMIT 1)."""
    from ..ops.hashtags import hot_changesets
    from .pip import assign_country

    hot = with_centroid(hot_changesets(changesets))
    return assign_country(hot, boundary_rows,
                          lon_col="centroid_lon", lat_col="centroid_lat")


def hot_changesets_incremental(stored_mv: DataFrame, batch: DataFrame,
                               boundary_rows: list[dict]) -> DataFrame:
    """X6 incremental — refresh the hot_changeset MV from a batch of
    new/updated changesets WITHOUT a full recompute (the reference refreshes
    this view by recomputing it end-to-end: advanced-queries.md:235-261).

    Delete-then-insert keyed on changeset id, the same MERGE shape as the
    S12 sink (runtime.sinks): every id present in ``batch`` is dropped from
    the stored MV — which covers bbox updates, country flips AND hashtag
    removals (a changeset whose new comment no longer matches simply never
    re-enters) — then the batch ALONE runs the hot filter + centroid PIP
    and the survivors are appended. The expensive stage (PIP) touches only
    batch rows; the stored side is one id-keyed anti-join with the touched
    id set broadcast (a refresh batch is small relative to the MV by
    construction). Correctness: country assignment is per-row, so
    incremental == full recompute exactly — the registered oracle IS the
    full recompute over the post-batch table."""
    touched = batch.select("id").distinct()
    kept = stored_mv.join(F.broadcast(touched), "id", "left_anti")
    fresh = hot_changesets_with_country(batch, boundary_rows).select(
        "id", "country")
    return kept.select("id", "country").unionByName(fresh)


def bbox_cell_cover_udf(res: int = 8, max_cells: int = 64):
    """pandas UDF: bbox corners → array of hex cell ids covering the bbox.

    The cover is computed on the hex axial grid by scanning the cell range
    of the corners; capped at `max_cells` (mega-changesets would otherwise
    expand to millions of cells — the cap plus the F14 filter bound the
    blow-up, and a NULL cover means "fall back to bbox predicates")."""
    from pyspark.sql.functions import pandas_udf

    from .cells import hex_cell_id, hex_decode, hex_encode

    @pandas_udf("array<long>")
    def _cover(min_lon: pd.Series, min_lat: pd.Series,
               max_lon: pd.Series, max_lat: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for x0, y0, x1, y1 in zip(min_lon, min_lat, max_lon, max_lat):
            if pd.isna(x0) or pd.isna(y0) or pd.isna(x1) or pd.isna(y1):
                out.append(None)
                continue
            y0c, y1c = max(-90.0, min(90.0, y0)), max(-90.0, min(90.0, y1))
            corners = hex_cell_id(np.array([x0, x1, x0, x1]),
                                  np.array([y0c, y0c, y1c, y1c]), res)
            qs = []
            rs = []
            for c in corners:
                _res, q, r = hex_decode(int(c))
                qs.append(q)
                rs.append(r)
            cells_set = []
            n = 0
            for q in range(min(qs), max(qs) + 1):
                for r in range(min(rs), max(rs) + 1):
                    cells_set.append(hex_encode(res, q, r))
                    n += 1
                    if n > max_cells:
                        break
                if n > max_cells:
                    break
            out.append(None if n > max_cells else cells_set)
        return pd.Series(out)

    return _cover
