"""Geospatial kernels: cell indexing, point-in-polygon, tiles, kNN, length."""
