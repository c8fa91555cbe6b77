"""Deterministic sf1 testdata: 10× replication of the driver's sf0.1 set.

The driver ships sf{0.001,0.01,0.1}; the scale-step bench needs one more
decade to expose super-linear tails (quadratic pair growth, global-state
operators) that sf0.1 cannot see. /root/testdata is read-only, so sf1 is
DERIVED, deterministically, from sf0.1 — no external data, fixed seeds:

  * fact/dim keys are offset per copy c ∈ [0, 10) by c·(max_key+1), so
    foreign-key joins (orders→customer, lineitem→part/supplier,
    events→user) keep exactly the sf0.1 match profile at 10× cardinality;
  * region/nation stay as-is (bounded dims, like TPC-H);
  * document text is WORD-PERMUTED per copy (seeded Fisher-Yates keyed on
    (copy, doc length), same for every same-length doc in a copy) plus
    a per-doc marker token: copies are distinct from their originals and
    contribute no cross-copy near-dup pairs (different copies use
    different permutations), while near-dup pairs WITHIN a copy mirror
    copy 0's — so near-dup pair counts grow ~linearly with the data, the
    honest crawl-growth profile (a naive tiny-suffix perturbation instead
    makes every doc 9 near-copies of itself: 45× pair density, a fixture
    artifact that swamps the scale-step timings);
  * embeddings are decorrelated per copy by deterministic ±1 sign flips
    (component d of copy c flips iff hash(c·64+d) is odd) — same value
    distribution, no cross-copy cosine structure.

Usage: python tools/make_sf1.py [out_dir]      (default /tmp/spark_graft_sf1)
Idempotent: skips tables whose parquet already exists.
"""

from __future__ import annotations

import os
import sys

import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))


_perm_cache: dict = {}


def ensure(out_dir: str = "/tmp/spark_graft_sf1") -> str:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def mx(table: str, col: str) -> int:
        return con.sql(
            f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    def emit(table: str, select_sql: str) -> None:
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            return
        con.sql(
            f"COPY ({select_sql}) TO '{dst}' (FORMAT PARQUET)"
        )

    # bounded dims: unchanged
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    C = mx("customer", "c_custkey") + 1
    S = mx("supplier", "s_suppkey") + 1
    P = mx("part", "p_partkey") + 1
    O = mx("orders", "o_orderkey") + 1
    E = mx("events", "event_id") + 1
    U = mx("events", "user_id") + 1
    D = mx("documents", "doc_id") + 1

    rng = f"(SELECT unnest(range({COPIES})) AS c)"
    emit("customer", f"""
        SELECT c_custkey + c * {C} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'), {rng}""")
    emit("supplier", f"""
        SELECT s_suppkey + c * {S} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet'), {rng}""")
    emit("part", f"""
        SELECT p_partkey + c * {P} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet'), {rng}""")
    emit("orders", f"""
        SELECT o_orderkey + c * {O} AS o_orderkey,
               o_custkey + c * {C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), {rng}""")
    emit("lineitem", f"""
        SELECT l_orderkey + c * {O} AS l_orderkey,
               l_partkey + c * {P} AS l_partkey,
               l_suppkey + c * {S} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), {rng}""")
    emit("events", f"""
        SELECT event_id + c * {E} AS event_id, ts,
               user_id + c * {U} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), {rng}""")
    docs_dst = f"{out_dir}/documents.parquet"
    if not os.path.exists(docs_dst):
        dtbl = pq.read_table(f"{SRC}/documents.parquet")
        doc_ids = dtbl.column("doc_id").to_pylist()
        texts = dtbl.column("text").to_pylist()
        langs = dtbl.column("lang").to_pylist()
        sources = dtbl.column("source").to_pylist()
        out_rows = {"doc_id": [], "text": [], "lang": [], "source": [],
                    "n_chars": []}
        for c in range(COPIES):
            for did, txt, lg, src_ in zip(doc_ids, texts, langs, sources):
                if c == 0 or txt is None:
                    new = txt
                else:
                    words = txt.split(" ")
                    # permutation per (copy, length), seeded-RNG shuffled and
                    # cached. Arithmetic key schemes (i·K + f(c) mod M, even
                    # scramble-mixed) keep the ORDER lattice-like across
                    # copies — copies came out as rotations of one another
                    # (measured: 180k spurious cross-copy near-dup pairs,
                    # cross-copy trigram jaccard 0.93). A seeded Fisher-Yates
                    # is genuinely decorrelated per copy; keying by length
                    # (not doc) keeps within-copy near-dup pairs aligned, so
                    # the copy mirrors copy 0's near-dup structure.
                    order = _perm_cache.get((c, len(words)))
                    if order is None:
                        r = random.Random(c * 1_000_003 + len(words))
                        order = list(range(len(words)))
                        r.shuffle(order)
                        _perm_cache[(c, len(words))] = order
                    new = " ".join([words[i] for i in order]
                                   + [f"c{c}x{did}"])
                out_rows["doc_id"].append(did + c * D)
                out_rows["text"].append(new)
                out_rows["lang"].append(lg)
                out_rows["source"].append(src_)
                out_rows["n_chars"].append(
                    len(new) if new is not None else None)
        pq.write_table(
            pa.table({
                "doc_id": pa.array(out_rows["doc_id"], type=pa.int64()),
                "text": pa.array(out_rows["text"], type=pa.string()),
                "lang": pa.array(out_rows["lang"], type=pa.string()),
                "source": pa.array(out_rows["source"], type=pa.string()),
                "n_chars": pa.array(out_rows["n_chars"], type=pa.int64()),
            }),
            docs_dst,
            # small row groups: a single-row-group file is unsplittable —
            # every Spark read of the table would serialize on ONE task
            row_group_size=2000,
        )

    dst = f"{out_dir}/embeddings.parquet"
    if not os.path.exists(dst):
        tbl = pq.read_table(f"{SRC}/embeddings.parquet")
        ids = tbl.column("vec_id").to_numpy()
        labels = tbl.column("label").to_numpy()
        X = np.stack(tbl.column("embedding").to_pylist()).astype(np.float32)
        V = int(ids.max()) + 1
        dim = X.shape[1]
        out_ids, out_vecs, out_labels = [], [], []
        for c in range(COPIES):
            h = (np.arange(c * dim, (c + 1) * dim, dtype=np.int64)
                 * 2654435761) % 2
            signs = np.where(h == 0, 1.0, -1.0).astype(np.float32)
            out_ids.append(ids + c * V)
            out_vecs.append(X if c == 0 else X * signs)
            out_labels.append(labels)
        flat = np.concatenate(out_vecs)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32()))
        pq.write_table(
            pa.table({
                "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "embedding": arr,
                "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
            }),
            dst,
            row_group_size=1000,   # splittable reads (see documents note)
        )
    con.close()
    return out_dir


if __name__ == "__main__":
    out = ensure(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n)
