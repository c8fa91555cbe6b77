"""Corpus frequency analyses: exact-verified Misra–Gries heavy hitters
and per-document n-gram novelty.

``heavy_hitters`` completes the engine's sketch family (HLL count-
distinct and KLL-style quantiles live in ops/stats.py) with the third
classic mergeable summary — frequent items — in the same *sketch-for-
candidates, exact-for-answers* shape those two use: the sketch only
BOUNDS the work, the emitted numbers are exact, so the oracle is plain
SQL and the output is provably identical to the brute-force answer.

Why the candidate set is complete (the Misra–Gries guarantee, public —
Misra & Gries 1982; merge analysis Agarwal et al., PODS'12): an MG(k)
summary over a stream of n items underestimates any item's count by at
most n/k. Partition the corpus into parts of n_p tokens (Σn_p = N). If a
term t has global count C > N/k, then in at least one partition its
local count c_p > n_p/k (otherwise C = Σc_p ≤ Σn_p/k = N/k). In that
partition MG(k)'s estimate for t is ≥ c_p − n_p/k > 0, and MG only
tracks items with positive counters — so t is in that partition's
candidate output. The union of per-partition candidates therefore
contains EVERY global heavy hitter; the exact recount pass then keeps
precisely the true ones. Candidate volume is ≤ k·partitions rows —
independent of corpus size.

Scale posture (100 TB): stage 1 is map-only (mapInPandas, one dict of ≤k
counters per partition, Arrow batches streamed — never the whole
partition in memory); stage 2 semi-joins the token stream against the
broadcast candidate set BEFORE its only shuffle, so shuffle volume is
O(occurrences of candidate terms), not O(corpus). The output is
partitioning-invariant even though the candidate SUPERSET isn't: the
exact filter count·k > N prunes any partition-dependent extras.

``novelty_scores`` is the diversity lens on the same gram machinery the
near-dup detectors use: the fraction of a document's distinct n-grams
that appear NOWHERE else in the corpus (gram df = 1). Boilerplate and
template spam score near 0, unique prose near 1 — the standard cheap
"how much does this doc add" signal for corpus curation.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_ngrams_np
from .quality import tokens

_WS = re.compile(r"\s+")


def _mg_update(counters: dict, toks: list, k: int) -> None:
    """One Misra–Gries pass: increment present keys, insert while < k
    counters, otherwise decrement ALL and drop zeros (the classic step)."""
    for t in toks:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]


def heavy_hitters(
    docs: DataFrame,
    k: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """All terms with exact global count · k > total tokens, as
    (term, n) with n EXACT — Misra–Gries bounds the candidate set, an
    exact recount of only those candidates produces the answer (see
    module docstring for the completeness proof)."""

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for txt in pdf[text_col]:
                if txt is None:
                    continue
                toks = [t for t in _WS.split(str(txt).lower()) if t]
                _mg_update(counters, toks, k)
        yield pd.DataFrame({"term": list(counters)})

    cand = (
        docs.select(text_col)
        .mapInPandas(mg_partition, "term string")
        .distinct()
    )
    exploded = docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    total = exploded.agg(F.count(F.lit(1)).alias("_N"))
    return (
        exploded.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) > F.col("_N"))
        .select("term", "n")
    )


def novelty_scores(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty) per document with ≥ 1 n-gram:
    novelty = fraction of the doc's DISTINCT n-grams whose corpus document
    frequency is exactly 1 (one IEEE division of two exact integers, so
    the oracle reproduces it bit-for-bit). Docs shorter than n tokens
    have no grams — novelty is undefined there and the rows are absent,
    mirroring containment_pairs' zero-denominator rule."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams_np(n)(F.col(text_col))).alias("gram"),
    )
    df_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    return (
        grams.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long")).alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_grams"))
    )
