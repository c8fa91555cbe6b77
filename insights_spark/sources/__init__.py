"""Pluggable batch sources beyond parquet (the reference ingests XML
dumps, API JSON, and .poly text — SURVEY §2.1; these are the
Spark-native equivalents for the same payloads serialized as line
formats)."""
