"""insights_spark — a PySpark-native spatial-join + tiling analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
hotosm/insights (reference: /root/reference) on idiomatic Spark:

- DataFrame / Spark SQL logical plans, Catalyst-optimized (no per-row Python).
- Vectorized pandas/Arrow UDF kernels only where built-ins can't express the
  semantics (XML extraction, point-in-polygon R-tree, geodesic length, kNN).
- Parquet-backed tables with an Iceberg-style MERGE/checkpoint layer
  (Iceberg catalog unavailable in-sandbox; the sink API is catalog-agnostic).

Subpackages
-----------
- ``geo``     : H3-style hex + S2 cell encoders, point-in-polygon broadcast
                join, slippy z/x/y tiles, cell-local kNN, geodesic length.
- ``ops``     : relational operator pack mirroring SURVEY.md §2 — latest
                version dedup, conditional-sum stats battery, hashtag
                tokenizer + calendar buckets, country insights.
- ``text``    : web-scale training-data ops — dedup (exact/minhash/simhash),
                language id, quality scores, token counts, fingerprints,
                embedding similarity search.
- ``runtime`` : checkpoint/resume, per-partition lineage metrics, skew salting.
- ``extract`` : OSM XML extraction over `pages(url, warc_ts, html, text, lang)`
                as an Arrow-batched UDF (reference: changesetmd.py:105-166,
                osmh.py:410-535).
"""

__version__ = "0.1.0"
