"""Similarity search over an embedding column (array<float>).

Two paths:
  * ``brute_force_topk`` — exact cosine top-k, query side broadcast; the
    correctness baseline and the right plan when |queries| is small.
  * ``lsh_topk`` — sign-random-projection LSH buckets (deterministic,
    md5-seeded hyperplanes) pruning the corpus before exact scoring inside
    buckets; the scale path (bucket join instead of cross join).

Dot products run JVM-side (``zip_with`` + ``aggregate``) in double precision;
no UDFs anywhere.  Results are rounded (6dp) with deterministic (score desc,
id asc) tie-breaks so outputs are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan: broadcast(queries) cross-join corpus -> narrow scoring -> per-query
    window top-k.  One shuffle (the window), corpus scanned once.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def int_hyperplane(plane_idx: int, dim: int) -> list:
    """Deterministic pseudo-random INTEGER hyperplane from md5 — no RNG
    state, reproducible across engines and runs.

    Components are 8-hex-digit md5 prefixes shifted to [-2^31, 2^31).  The
    sign of a dot product is invariant under positive scaling, so integer
    (unnormalized) planes give the same buckets as unit planes — but the dot
    products are exact int64 arithmetic, so sign decisions are bit-identical
    across Spark, DuckDB, and NumPy (no float summation-order hazards).
    With |v_i| <= ~10^3 (quantized vectors) and dim <= 4096 the accumulator
    stays below 2^53, far from ANSI-mode overflow.
    """
    import hashlib

    return [
        int(hashlib.md5(f"plane:{plane_idx}:{d}".encode()).hexdigest()[:8], 16)
        - (1 << 31)
        for d in range(dim)
    ]


def quantize_vec(vec: Column, scale: int = 1000) -> Column:
    """Integer-quantized copy of a float vector: round(x*scale) as long.
    Dot products / norms over quantized vectors are exact integers, making
    cosine scores engine-portable after one final double division."""
    return F.transform(vec, lambda x: F.round(x * scale).cast("long"))


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, x: s + x
    )


def sign_lsh_bucket(vec_int: Column, dim: int, planes: int = 8, first_plane: int = 0) -> Column:
    """Bit-string bucket id over an integer-quantized vector: the sign of the
    exact integer projection on each deterministic hyperplane."""
    bits = []
    for p in range(first_plane, first_plane + planes):
        plane = F.array(*[F.lit(x).cast("long") for x in int_hyperplane(p, dim)])
        bits.append(F.when(_int_dot(vec_int, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def sign_lsh_bands(
    vec_int: Column, dim: int, bands: int = 8, planes_per_band: int = 3
) -> Column:
    """OR-amplified sign-LSH: array<struct<band,bucket>> — a pair is a
    candidate if it collides in ANY band.  For near-duplicates at cosine
    >= t (angle theta), a band matches with (1-theta/pi)^planes and the
    miss probability decays as (1-p_band)^bands, so recall is tunable
    without ever forming the O(n^2) pair space."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sign_lsh_bucket(
                    vec_int, dim, planes_per_band, first_plane=b * planes_per_band
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's LSH
    bucket.  Equi-join on bucket replaces the cross join — at 10^9 vectors
    with b planes the candidate set shrinks ~2^-b per bucket.  Buckets come
    from exact integer projections of the quantized vector (deterministic
    across engines); scoring stays full-precision double on the raw vector.
    """
    # quantize once per row and derive the per-plane sign bits from the
    # attribute (r07): an inline quantize inside sign_lsh_bucket is
    # re-evaluated once per plane (no CSE for interpreted HOF trees)
    c = (
        corpus.select(
            F.col(id_col).alias("corpus_id"),
            _as_double(F.col(vec_col)).alias("cv"),
            quantize_vec(F.col(vec_col)).alias("_vq"),
        )
        .withColumn("bucket", sign_lsh_bucket(F.col("_vq"), dim, planes))
        .drop("_vq")
        .withColumn("cn", _norm(F.col("cv")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
            quantize_vec(F.col(vec_col)).alias("_vq"),
        )
        .withColumn("bucket", sign_lsh_bucket(F.col("_vq"), dim, planes))
        .drop("_vq")
        .withColumn("qn", _norm(F.col("qv")))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
