"""Property-based tests (hypothesis) for the pure numpy kernels —
no SparkSession, so these run in milliseconds and explore the input space
the example-based tests can't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from insights_spark.geo import cells, length, pip

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)


@given(lons, lats)
@settings(max_examples=200, deadline=None)
def test_s2_hierarchy_property(lon, lat):
    c12 = cells.s2_cell_id(np.array([lon]), np.array([lat]), 12)[0]
    c8 = cells.s2_cell_id(np.array([lon]), np.array([lat]), 8)[0]
    p = c12
    for _ in range(4):
        p = cells.s2_parent(np.array([p]))[0]
    assert p == c8
    assert cells.s2_level(c12) == 12 and cells.s2_level(c8) == 8


@given(lons, lats)
@settings(max_examples=200, deadline=None)
def test_hex_center_roundtrip(lon, lat):
    c = int(cells.hex_cell_id(np.array([lon]), np.array([lat]), 6)[0])
    clon, clat = cells.hex_center(c)
    # the center of a cell maps back to the same cell
    assert int(cells.hex_cell_id(np.array([clon]), np.array([clat]), 6)[0]) == c
    # and the point is within ~2 cell diameters of its cell center
    size = cells.hex_edge_deg(6)
    assert abs(clon - lon) < 4 * size and abs(clat - lat) < 4 * size


@given(lons, lats, lons, lats)
@settings(max_examples=100, deadline=None)
def test_vincenty_metric_properties(lon1, lat1, lon2, lat2):
    d = length.vincenty_m([lon1], [lat1], [lon2], [lat2])[0]
    d_rev = length.vincenty_m([lon2], [lat2], [lon1], [lat1])[0]
    assert np.isfinite(d) and d >= 0.0
    assert abs(d - d_rev) <= 1e-6 * max(d, 1.0)  # symmetry
    assert d <= 20_037_508.0 * 1.01  # never exceeds half circumference (+1%)
    if (lon1, lat1) == (lon2, lat2):
        assert d == 0.0


@given(st.lists(st.tuples(lons, lats), min_size=3, max_size=8), lons, lats)
@settings(max_examples=100, deadline=None)
def test_pip_edge_inclusive_vertices(poly_pts, qlon, qlat):
    """Every polygon VERTEX is covered by its own polygon (edge-inclusive),
    and locate() never crashes on arbitrary query points."""
    ring = [[x, y] for x, y in poly_pts] + [[poly_pts[0][0], poly_pts[0][1]]]
    idx = pip.PolygonIndex(
        [{"name_en": "P", "priority": False, "polygons": [[ring]]}]
    )
    xs = np.array([p[0] for p in poly_pts])
    ys = np.array([p[1] for p in poly_pts])
    got = idx.locate(xs, ys)
    assert all(g == "P" for g in got)
    idx.locate(np.array([qlon]), np.array([qlat]))  # no crash


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_poly_hash_np_matches_python(s):
    from insights_spark.text.dedup import BASE, MOD, SEED, poly_hash_np

    h = SEED
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    got = poly_hash_np([s])[0]
    assert got == h
