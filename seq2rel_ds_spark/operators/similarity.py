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

import math

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


def _hyperplane(plane_idx: int, dim: int) -> list:
    """Deterministic pseudo-random unit hyperplane from md5 — no RNG state,
    reproducible across engines and runs."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:{d}".encode()).hexdigest()
        # map 12 hex chars to [-1, 1)
        vals.append(int(h[:12], 16) / float(1 << 47) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 8) -> Column:
    """Bit-string bucket id: sign of the projection on each hyperplane."""
    v = _as_double(vec)
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(p, dim)])
        bits.append(F.when(_dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
    with b planes the candidate set shrinks ~2^-b per bucket.
    """
    bucket = sign_lsh_bucket(F.col(vec_col), dim, planes)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        bucket.alias("bucket"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        bucket.alias("bucket"),
    ).withColumn("qn", _norm(F.col("qv")))
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
