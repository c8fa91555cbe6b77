"""Exactly-once streaming commits into a snapshot table
(streaming/table_sink.py): per-epoch atomic snapshots, replayed epochs
no-op by the manifest epoch stamp."""

from __future__ import annotations

from insights_spark.runtime.tablefmt import SnapshotTable
from insights_spark.streaming.table_sink import (
    commit_epoch,
    committed_epochs,
    stream_to_snapshot_table,
)


def _rows(spark, table_path):
    t = SnapshotTable(spark, table_path)
    return sorted(tuple(r) for r in t.read().collect())


def test_stream_commits_one_snapshot_per_epoch(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, v string").parquet(src)
    q = stream_to_snapshot_table(stream, tbl, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert _rows(spark, tbl) == [(1, "a"), (2, "b")]

    # second file → second epoch → second snapshot on restart
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1)\
        .write.mode("append").parquet(src)
    q2 = stream_to_snapshot_table(stream, tbl, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert _rows(spark, tbl) == [(1, "a"), (2, "b"), (3, "c")]
    t = SnapshotTable(spark, tbl)
    assert committed_epochs(t) == {0, 1}
    assert len(t.history()) == 2


def test_replayed_epoch_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    batch = spark.createDataFrame([(1, "a")], "id long, v string")
    assert commit_epoch(tbl, batch, epoch_id=0) is True
    n1 = _rows(spark, tbl)
    # the crash window: table committed, Spark checkpoint lost → replay
    assert commit_epoch(tbl, batch, epoch_id=0) is False
    assert _rows(spark, tbl) == n1
    # a NEW epoch with the same rows is a genuine append, not a dup
    assert commit_epoch(tbl, batch, epoch_id=1) is True
    assert len(_rows(spark, tbl)) == 2


def test_within_epoch_key_dedup(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    batch = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "id long, v string")
    commit_epoch(tbl, batch, epoch_id=0, keys=["id"])
    got = _rows(spark, tbl)
    assert len(got) == 2 and {r[0] for r in got} == {1, 2}


def test_streaming_table_compacts(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for e in range(4):  # one dir per epoch — the small-files accretion
        commit_epoch(tbl, spark.createDataFrame(
            [(e, "x")], "id long, v string"), epoch_id=e)
    t = SnapshotTable(spark, tbl)
    assert len(t._load(t.current_snapshot_id())["dirs"]) == 4
    t.compact(target_partitions=1)
    assert len(t._load(t.current_snapshot_id())["dirs"]) == 1
    assert len(_rows(spark, tbl)) == 4
    # epoch history survives compaction (replay detection still works)
    assert committed_epochs(t) == {0, 1, 2, 3}
    assert commit_epoch(tbl, spark.createDataFrame(
        [(9, "y")], "id long, v string"), epoch_id=2) is False


def test_stream_scd2_maintenance(spark, tmp_path):
    """Streaming SCD2 dimension: two micro-batches (the second delivering
    an OUT-OF-ORDER version that splices into epoch-1 intervals) converge
    to the batch scd2_intervals over all versions; replaying an epoch is
    a no-op."""
    import time as _time
    from datetime import date

    from insights_spark.ops.latest import scd2_intervals
    from insights_spark.streaming.table_sink import (
        commit_scd2_epoch,
        stream_scd2_to_table,
    )

    schema = "type string, id long, version long, timestamp date"
    d = date
    b1 = [("node", 1, 1, d(2021, 1, 1)), ("node", 1, 3, d(2021, 3, 1)),
          ("way", 7, 1, d(2021, 2, 1))]
    b2 = [("node", 1, 2, d(2021, 2, 1)),     # late: splices between v1/v3
          ("node", 2, 1, d(2021, 5, 1))]
    src = str(tmp_path / "vsrc")
    tbl = str(tmp_path / "vtbl")
    ckpt = str(tmp_path / "vckpt")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_scd2_to_table(stream, tbl, ckpt, trigger_once=True)
    q.awaitTermination(180)

    cols = ["type", "id", "version", "valid_from", "valid_to", "is_current"]
    got = sorted(tuple(r) for r in
                 SnapshotTable(spark, tbl).read().select(*cols).collect())
    want = sorted(tuple(r) for r in scd2_intervals(
        spark.createDataFrame(b1 + b2, schema)).select(*cols).collect())
    assert got == want and len(got) == 5
    # replaying an already-committed epoch changes nothing
    t = SnapshotTable(spark, tbl)
    before = t.current_snapshot_id()
    assert commit_scd2_epoch(tbl, spark.createDataFrame(b2, schema), 1) is False
    assert t.current_snapshot_id() == before
