from __future__ import annotations

from insights_spark.text.links import bfs_hop_distance


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _src(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _dists(df):
    return {r["id"]: r["dist"] for r in df.collect()}


def test_bfs_chain_and_hop_cap(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    out = _dists(bfs_hop_distance(e, _src(spark, [0]), max_hops=2))
    assert out == {0: 0, 1: 1, 2: 2}  # 3 is beyond the cap → absent


def test_bfs_cycle_terminates(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    out = _dists(bfs_hop_distance(e, _src(spark, [0]), max_hops=10))
    assert out == {0: 0, 1: 1, 2: 2}


def test_bfs_multi_source_takes_min(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = _dists(bfs_hop_distance(e, _src(spark, [0, 3]), max_hops=4))
    # 4 is 1 hop from source 3, not 4 hops from source 0
    assert out == {0: 0, 3: 0, 1: 1, 4: 1, 2: 2}


def test_bfs_diamond_shortest_path_wins(spark):
    # 0→9 directly and 0→1→2→9: 9 must get dist 1
    e = _edges(spark, [(0, 9), (0, 1), (1, 2), (2, 9)])
    out = _dists(bfs_hop_distance(e, _src(spark, [0]), max_hops=5))
    assert out[9] == 1 and out[2] == 2


def test_bfs_unreachable_absent_and_partitioning_invariant(spark):
    e = _edges(spark, [(0, 1), (5, 6)])  # 5,6 disconnected from 0
    out = _dists(bfs_hop_distance(e, _src(spark, [0]), max_hops=6))
    assert out == {0: 0, 1: 1}
    out2 = _dists(
        bfs_hop_distance(e.repartition(7), _src(spark, [0]), max_hops=6))
    assert out2 == out
