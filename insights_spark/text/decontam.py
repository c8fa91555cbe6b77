"""Benchmark decontamination — flag training docs that contain an eval set's
n-grams (the before-training hygiene pass every LLM data pipeline runs;
cf. the n-gram overlap checks described in public LM reports).

Semantics: a benchmark ITEM is a token sequence; a corpus doc is
CONTAMINATED by that item iff the item's full `n`-token window appears
verbatim (case-normalized, whitespace-tokenized) among the doc's n-grams.
Output counts how many distinct benchmark grams each contaminated doc
contains — the triage signal (1 shared gram = likely coincidence at small
n, many = verbatim inclusion).

100 TB posture: benchmark grams are the SMALL side by construction (eval
sets are thousands of items, corpora are billions of docs) — they hash to
a bounded key set that broadcasts; the corpus side is ONE scan emitting
(gram-hash, doc_id) pairs which semi-reduce against the broadcast before
any shuffle (Catalyst turns the inner join against a broadcast into a
map-side hash probe). No all-pairs stage exists at any size; the only
shuffle is the per-doc count aggregation over MATCHED pairs, bounded by
the contamination volume, not the corpus.

Hashing uses the engine's portable polynomial gram hash (`poly_hash` SQL
parity in dedup), so the DuckDB oracle replays the identical arithmetic —
membership is engine-exact, no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _gram_hashes(text_col, n: int):
    """All n-gram polynomial hashes of a text column, as array<long>.

    Same arithmetic as dedup.poly_hash / the inverted-index oracle:
    h = fold(7, h*31 + ord(char)) mod 1e9+7 over the space-joined gram.
    Computed JVM-side (transform + aggregate); the fold is interpreted,
    so at scale this column is computed once per doc in the scan stage —
    cost ∝ tokens, not pairs.
    """
    toks = F.filter(
        F.split(F.lower(text_col), TOKEN_SPLIT), lambda t: t != ""
    )
    k = F.size(toks) - (n - 1)
    grams = F.when(k > 0, F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )).otherwise(F.array().cast("array<string>"))
    return F.transform(
        grams,
        lambda g: F.aggregate(
            F.filter(F.split(g, ""), lambda c: c != ""),
            F.lit(7).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(1_000_000_007),
        ),
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bench_grams) for every doc sharing ≥1 n-gram with the
    benchmark; n_bench_grams = how many DISTINCT benchmark gram hashes the
    doc contains."""
    bench_grams = (
        benchmark.select(
            F.explode(_gram_hashes(F.col(bench_text_col), n)).alias("_gh")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_gram_hashes(F.col(text_col), n)))
        .alias("_gh"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "_gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bench_grams"))
    )
