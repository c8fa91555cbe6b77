"""Pipeline on the snapshot table format (jobs/pipeline.py
table_format='snapshot'): logically identical warehouse to the parquet
backend, plus per-batch time travel the parquet backend cannot offer."""

from __future__ import annotations

from pyspark.sql import functions as F

from insights_spark import synth
from insights_spark.jobs import pipeline
from insights_spark.runtime.tablefmt import SnapshotTable


def _multiset(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*cols).collect()
    )


def test_snapshot_pipeline_matches_parquet_and_time_travels(spark, tmp_path):
    pq_out = str(tmp_path / "wh_pq")
    sn_out = str(tmp_path / "wh_sn")
    pages12 = synth.pages_df(spark, n_pages=12)
    pages18 = synth.pages_df(spark, n_pages=18)  # first 12 identical (seeded)

    # batch 1 then incremental batch 2, on BOTH backends
    pipeline.run(spark, pages12, pq_out)
    t_pq = pipeline.run(spark, pages18, pq_out, resume=True)
    pipeline.run(spark, pages12, sn_out, table_format="snapshot")
    t_sn = pipeline.run(spark, pages18, sn_out, resume=True,
                        table_format="snapshot")
    assert set(t_pq) == set(t_sn)

    # table-format invariance: every warehouse table is logically equal
    for name in ("changesets", "element_history", "all_changesets_stats",
                 "tile_density", "all_osm_hashtags", "changeset_comments"):
        pq_df = spark.read.parquet(t_pq[name])
        sn_df = SnapshotTable(spark, t_sn[name]).read()
        cols = sorted(pq_df.columns)
        assert cols == sorted(sn_df.columns), name
        assert _multiset(pq_df, cols) == _multiset(sn_df, cols), name

    # time travel: snapshot 1 of changesets == a fresh batch-1-only run
    cs = SnapshotTable(spark, t_sn["changesets"])
    assert len(cs.history()) >= 2  # one commit per batch
    solo_out = str(tmp_path / "wh_solo")
    solo = pipeline.run(spark, pages12, solo_out)
    assert _multiset(cs.read(snapshot_id=1)) == _multiset(
        spark.read.parquet(solo["changesets"])
    )
    # ... and by the batch-sequence commit clock (ts = max warc_ts)
    seq1 = int(
        pages12.agg(F.max("warc_ts").alias("m")).collect()[0]["m"].timestamp()
    )
    assert _multiset(cs.read(as_of_ts=seq1)) == _multiset(cs.read(snapshot_id=1))


def test_snapshot_pipeline_replay_converges(spark, tmp_path):
    out = str(tmp_path / "wh")
    pages = synth.pages_df(spark, n_pages=10)
    pipeline.run(spark, pages, out, table_format="snapshot")
    el = SnapshotTable(spark, f"{out}/element_history")
    n1 = el.read().count()
    # replay the SAME batch without the resume filter: dedup sinks make it
    # a no-op on contents (idempotent ingest, ST3)
    pipeline.run(spark, pages, out, table_format="snapshot")
    assert el.read().count() == n1
    st = SnapshotTable(spark, f"{out}/all_changesets_stats").read()
    assert st.count() == st.select("changeset").distinct().count()


def test_bad_table_format_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        pipeline.run(spark, synth.pages_df(spark, n_pages=2),
                     str(tmp_path / "x"), table_format="iceberg")
