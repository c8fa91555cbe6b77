"""Polyline simplification — Douglas–Peucker (1973, public algorithm).

Way geometries at render zoom levels carry far more vertices than a tile
pixel can show; simplification before the tile sink is the standard
vector-pipeline step (the reference stores raw way geometries and leaves
rendering density to consumers — this is the engine-side primitive that
makes the z/x/y vector product shippable at planet scale).

Shape: one Arrow-batched pandas UDF over the per-way vertex array —
embarrassingly parallel per way, no shuffle at all (the geometry is
already assembled by construct_way_geometry, geo/length.py). The kernel
is the ITERATIVE stack form of DP (no recursion-depth hazard on
degenerate million-vertex ways). Distances are planar in degrees on
(lon, lat) — consistent with the engine's other local-geometry kernels
and documented so the tolerance is interpretable (a tolerance in meters
would divide by cos(lat); callers at high latitudes should pre-scale).

Determinism: pure function of the input array — same simplified polyline
on every partitioning/retry. Ties (max-deviation shared by two vertices)
break to the LOWEST index via numpy argmax.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql.functions import pandas_udf


def _dp_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one polyline, iterative Douglas–Peucker."""
    n = xs.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        x0, y0, x1, y1 = xs[i], ys[i], xs[j], ys[j]
        dx, dy = x1 - x0, y1 - y0
        seg2 = dx * dx + dy * dy
        px = xs[i + 1:j] - x0
        py = ys[i + 1:j] - y0
        if seg2 == 0.0:
            d2 = px * px + py * py  # closed segment: plain distance to anchor
        else:
            cross = px * dy - py * dx
            d2 = (cross * cross) / seg2
        k = int(np.argmax(d2))  # ties → lowest index
        if d2[k] > tol2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def dp_simplify_udf(tol_deg: float):
    """pandas UDF: array<struct<lon,lat>> → simplified array (same type).

    NULL and <3-vertex inputs pass through unchanged; the first and last
    vertices are always preserved (DP invariant).
    """

    @pandas_udf("array<struct<lon:double,lat:double>>")
    def _simplify(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            if g is None or len(g) < 3:
                out.append(g)
                continue
            xs = np.fromiter((p["lon"] for p in g), dtype=np.float64)
            ys = np.fromiter((p["lat"] for p in g), dtype=np.float64)
            m = _dp_mask(xs, ys, tol_deg)
            out.append([p for p, k in zip(g, m) if k])
        return pd.Series(out)

    return _simplify
