"""Sequence packing — docs → fixed-length token windows (pretraining prep).

A tokenized pretraining corpus is consumed as back-to-back sequences of
exactly `seq_len` tokens; packing = laying every document's tokens end to
end (in a stable document order) and cutting the stream every `seq_len`.
The output here is the ASSIGNMENT table — (doc_id, seq_id, tok_start,
n_toks): which slice of which document lands in which training sequence —
the plan a tokenizer/writer executes without ever re-shuffling text.

The interesting part at 100 TB is the GLOBAL PREFIX SUM of token counts
in doc order. The naive expression — ``sum(n) OVER (ORDER BY doc_id)`` —
is an unpartitioned window: every row to ONE task (the exact shape the
round-2 verdict banned for top-k). This implementation is the textbook
two-phase distributed scan instead:

  1. range-partition by doc_id (so partition i holds a contiguous id
     span), cumulative-sum WITHIN each partition (window keyed on the
     partition id — parallel across partitions),
  2. collect the per-partition TOTALS (one row per partition — bounded by
     the partition count, the same driver-cost class as a checkpoint
     row), prefix-sum those on the driver, broadcast-join the offsets
     back, add.

Every doc then knows its absolute start offset; its (first, last)
sequence ids follow by integer division, and one explode emits its chunk
per overlapped sequence. All arithmetic is exact BIGINT, reproduced
verbatim by the DuckDB oracle (where the single-node global window IS the
right plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .quality import token_count, tokens


def global_cumsum_multi(
    df: DataFrame,
    value_cols: list,
    order_exprs: list,
    out_cols: list,
    partitions: int | None = None,
) -> DataFrame:
    """GLOBAL inclusive cumulative sums of several ``value_cols`` in ONE
    ``order_exprs`` scan — the textbook two-phase distributed prefix sum
    (module docstring): range-partition on the sort key → per-partition
    window cumsums → bounded per-partition totals collect → broadcast
    offsets back. The naive ``sum() OVER (ORDER BY …)`` is an
    unpartitioned window (every row to ONE task); this shape is what the
    suite-wide plan test allows. All requested sums ride the same
    exchange and the same totals collect — k columns cost one scan.

    ``order_exprs`` must be a total order (include a unique tiebreak
    column) — ties split across partition boundaries would otherwise make
    the prefix sum nondeterministic. Returns the input columns plus
    ``out_cols`` (BIGINT for integral inputs).
    """
    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_part, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # localCheckpoint pins ONE evaluation of the range exchange — its
    # boundary sampler is per-execution-seeded, so the totals collect and
    # the final output must read the SAME partition assignment (the
    # silent-wrong-offsets hazard only manifests beyond the sampler size,
    # i.e. exactly at scale).
    local = part
    for i, vc in enumerate(value_cols):
        local = local.withColumn(f"_cum{i}", F.sum(vc).over(w))
    local = local.localCheckpoint()

    totals = local.groupBy("_pid").agg(
        *[F.max(f"_cum{i}").alias(f"_total{i}") for i in range(len(value_cols))]
    ).collect()
    running = [0] * len(value_cols)
    offsets = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], *running))
        running = [
            running[i] + row[f"_total{i}"] for i in range(len(value_cols))
        ]
    off_schema = "_pid int, " + ", ".join(
        f"_offset{i} long" for i in range(len(value_cols))
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    out = local.join(F.broadcast(off_df), "_pid")
    drop = ["_pid"]
    for i, oc in enumerate(out_cols):
        out = out.withColumn(oc, F.col(f"_offset{i}") + F.col(f"_cum{i}"))
        drop += [f"_cum{i}", f"_offset{i}"]
    return out.drop(*drop)


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_exprs: list,
    out_col: str = "_cum_global",
    partitions: int | None = None,
) -> DataFrame:
    """Single-column wrapper over ``global_cumsum_multi`` (see there)."""
    return global_cumsum_multi(
        df, [value_col], order_exprs, [out_col], partitions=partitions
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, seq_id, tok_start, n_toks) packing assignments.

    `tok_start` is DOC-LOCAL (offset of the chunk inside the document's
    own token list); `seq_id` is the global 0-based training-sequence
    index. Docs pack in ascending `id_col` order; empty docs are skipped.
    A document longer than `seq_len` spans several sequences (one row per
    sequence it touches).
    """
    t = (
        docs.select(F.col(id_col).alias("doc_id"),
                    token_count(F.col(text_col)).cast("long").alias("n_toks"))
        .filter(F.col("n_toks") > 0)
    )
    cum = global_cumsum(t, "n_toks", [F.asc("doc_id")], partitions=partitions)

    L = int(seq_len)
    placed = (
        cum.withColumn("_start", F.col("_cum_global") - F.col("n_toks"))
        .withColumn("_first", F.expr("_start DIV " + str(L)))
        .withColumn("_last", F.expr("(_start + n_toks - 1) DIV " + str(L)))
    )
    seq = placed.select(
        "doc_id", "n_toks", "_start",
        F.explode(F.sequence(F.col("_first"), F.col("_last"))).alias("seq_id"),
    )
    chunk_lo = F.greatest(F.col("seq_id") * L, F.col("_start"))
    chunk_hi = F.least((F.col("seq_id") + 1) * L, F.col("_start") + F.col("n_toks"))
    return seq.select(
        "doc_id",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        (chunk_lo - F.col("_start")).cast("bigint").alias("tok_start"),
        (chunk_hi - chunk_lo).cast("bigint").alias("n_toks"),
    )


def corpus_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: int = 17,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    reproducible pseudo-random position (`shuffle_rank`, 0-based) — the
    order a sequential writer emits pretraining examples in. Keyed on the
    portable multiplicative id hash (content-stable: survives
    repartitioning, re-ingestion order, appends — same property as
    train_test_split), NOT on Spark's rand().

    The global dense rank is a cumsum of ones in hash order through the
    same two-phase distributed scan as pack_sequences (`global_cumsum`) —
    never a single-partition ``row_number() OVER (ORDER BY …)``. At
    100 TB the downstream writer does ``repartitionByRange(shuffle_rank)``
    and writes; this table IS the shuffle.
    """
    # wrap-before-multiply keeps the product in int64 at 10^10-doc ids
    # (identical values mod 1e9+7; see train_test_split for the argument)
    h = F.pmod(
        F.pmod(F.col(id_col), F.lit(1 << 31)) * 2654435761 + seed,
        F.lit(1_000_000_007),
    )
    d = docs.select(F.col(id_col)).withColumn("_hk", h).withColumn(
        "_one", F.lit(1).cast("long")
    )
    ranked = global_cumsum(
        d, "_one", [F.asc("_hk"), F.asc(id_col)], out_col="_rank1",
        partitions=partitions,
    )
    return ranked.select(
        id_col, (F.col("_rank1") - 1).cast("long").alias("shuffle_rank")
    )


def sliding_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping context windows — the chunking step in front of every
    embedding/retrieval indexer (and the stride-overlap variant of
    pack_sequences' disjoint packing): window starts at 0, stride,
    2·stride, … while start < n_tokens; the last window is short rather
    than dropped, so every token is covered by ≥1 window and consecutive
    windows overlap by window − stride tokens.

    Output: (doc_id, win_idx, tok_start, win_tokens, win_text) — one row
    per window, win_text the space-joined token slice. Pure column
    expressions (sequence/transform/slice): MAP-ONLY, zero shuffle, zero
    UDF — the plan is a single projection whatever the corpus size, which
    is the entire 100 TB story for this operator. Docs with no tokens
    produce no windows.
    """
    S, W = int(stride), int(window)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tok")
    ).filter(F.size("_tok") > 0)
    n_win = F.floor((F.size("_tok") - 1) / F.lit(S)).cast("long") + 1
    wins = F.transform(
        F.sequence(F.lit(0).cast("long"), n_win - 1),
        lambda i: F.struct(
            i.alias("win_idx"),
            (i * S).alias("tok_start"),
            F.least(
                F.lit(W).cast("long"), F.size("_tok") - i * S
            ).alias("win_tokens"),
            F.array_join(
                F.slice("_tok", (i * S + 1).cast("int"), W), " "
            ).alias("win_text"),
        ),
    )
    return toks.select("doc_id", F.explode(wins).alias("_w")).select(
        "doc_id",
        F.col("_w.win_idx").alias("win_idx"),
        F.col("_w.tok_start").alias("tok_start"),
        F.col("_w.win_tokens").alias("win_tokens"),
        F.col("_w.win_text").alias("win_text"),
    )


def curriculum_order(
    docs: DataFrame,
    bands: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
    partitions: int | None = None,
) -> DataFrame:
    """Curriculum training order: quality-banded, highest band first,
    deterministic hash shuffle WITHIN each band — the standard curriculum
    schedule (clean data early) without sacrificing within-band mixing.

    Band = floor(uniq_token_ratio · bands) clamped to bands-1 — a VALUE
    band, not a rank band (ntile would need a global sort of ranks;
    value banding is map-only and content-stable across appends). The
    global position rides the same two-phase distributed prefix scan as
    corpus_shuffle (never a single-partition ORDER BY window), ordered by
    (band DESC, id-hash, id). Downstream: repartitionByRange on
    curriculum_rank and write — this table IS the schedule.

    Output: (doc_id, band, curriculum_rank 0-based).
    """
    from .quality import quality_scores

    q = quality_scores(docs, text_col=text_col).select(
        id_col, "uniq_token_ratio"
    )
    band = F.least(
        F.lit(bands - 1),
        F.floor(F.col("uniq_token_ratio") * bands).cast("int"),
    ).cast("int")
    h = F.pmod(
        F.pmod(F.col(id_col), F.lit(1 << 31)) * 2654435761 + seed,
        F.lit(1_000_000_007),
    )
    d = (
        q.withColumn("band", band)
        .withColumn("_hk", h)
        .withColumn("_one", F.lit(1).cast("long"))
    )
    ranked = global_cumsum(
        d, "_one", [F.desc("band"), F.asc("_hk"), F.asc(id_col)],
        out_col="_r", partitions=partitions,
    )
    return ranked.select(
        id_col, "band",
        (F.col("_r") - 1).cast("long").alias("curriculum_rank"),
    )


def shard_layout(
    docs: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    bytes_col: str = "n_chars",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic equal-byte output sharding — the step that turns a
    filtered corpus into the ~fixed-size training shards every public
    data release ships (C4/Pile/RedPajama all publish N-MB shard files):
    docs are laid out in ascending ``id_col`` order and cut into shards of
    ~``target_bytes`` by offset — doc d lands in shard
    floor(start_offset(d) / target_bytes), where start_offset is the
    exclusive prefix sum of ``bytes_col``. A document never splits; shard
    sizes deviate from target by at most one document.

    Output: one row per shard — (shard_id, n_docs, shard_bytes,
    first_doc, last_doc) — all BIGINT, bit-identical across partitionings
    because the layout is a pure function of the (id, bytes) relation.

    Scale posture (100 TB): the prefix sum rides the repo-wide TWO-PHASE
    distributed scan (global_cumsum_multi — per-partition partials, one
    tiny driver-side offset table, map-side add-back; no single-partition
    window anywhere, plan-test-pinned suite-wide), then ONE hash shuffle
    on shard_id for the rollup. This is the exact shape a writer uses to
    `repartitionByRange(shard_id)` into equal output files.
    """
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(bytes_col).cast("long").alias("_b"),
    ).filter(F.col("_b") > 0)
    cum = global_cumsum(t, "_b", [F.asc("doc_id")], partitions=partitions)
    assigned = cum.select(
        "doc_id",
        "_b",
        F.expr(f"(_cum_global - _b) DIV {int(target_bytes)}").alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_b").cast("long").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
