"""Mergeable distinct-count sketches (k-minimum-values).

Training-data-pipeline extension (SURVEY.md §2.9 family) — the reference
pipeline (JohnGiorgi/seq2rel-ds) has no sketch operators; at 100 TB a
pipeline needs cardinality estimates (vocabulary size per shard/language,
join-key cardinality for plan decisions) without paying an exact
COUNT(DISTINCT) shuffle over billions of values.

KMV over HLL on purpose: the estimate is a pure function of the k smallest
hash values, so with a fixed hash (md5) the result is DETERMINISTIC and
exactly reproducible by any engine — it can sit under the DuckDB oracle
gate, which HyperLogLog (engine-private register layouts) cannot.

Scale shape: the sketch is MERGEABLE — "k smallest of a union = k smallest
of the concatenated per-partition k-smallest lists" — so the production
path is a partial aggregate: each task keeps its local k minima (a bounded
heap, map-side combine), the merge is a k-way min over ≤ k·P values, and
nothing un-aggregated crosses the shuffle.  The implementation below gets
the same map-side reduction from Catalyst for free: groupBy(group, h) de-
duplicates with partial aggregation, and the per-group row_number window
only ever sees distinct hash values.  Ties at the k-boundary cannot change
the estimate (the k-th smallest VALUE is tie-invariant even when
row_number's pick is not).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# hash domain: first 8 hex chars of md5 -> uniform 32-bit integer
_HASH_SPACE = float(1 << 32)


def hash32(col) -> Column:
    """Uniform 32-bit hash of a string column (first 4 md5 bytes)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def cms_table(
    values: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of a (multiset) value column: ``depth`` independent
    hash rows × ``width`` cells -> (seed, cell, cnt), depth*width rows of
    bounded state no matter how many distinct values stream through.

    The frequency-sketch sibling of :func:`kmv_distinct`: mergeable (cells
    add), deterministic (seeded md5 rows, so any engine rebuilds the same
    table), and built by ONE partial-aggregated groupBy — the map-side
    combine reduces every scan task's output to <= depth*width cells, so
    the shuffle is O(state), not O(rows).
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    cells = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            hash32(F.concat_ws(":", F.lit(str(s)), F.col(value_col))),
                            F.lit(width),
                        ).alias("cell"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sc")
    )
    return cells.groupBy("sc.seed", "sc.cell").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for ``queries[value_col]`` against a
    :func:`cms_table` sketch: est = min over the value's depth cells —
    never an underestimate (every cell holds the true count plus
    collisions).  The sketch is KB-sized by construction, so the lookup
    join broadcasts; estimates for a dimension-sized query set cost one
    broadcast hash join, no shuffle of the queries.

    The sketch table stores only NONZERO cells, so the probe join is a
    LEFT join with absent cells coalesced to 0 (standard CMS semantics:
    an empty cell means count 0).  A value hashing to >= 1 empty cell
    therefore estimates 0 — including values never inserted at all,
    which return a 0 row rather than silently vanishing."""
    probes = queries.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            hash32(F.concat_ws(":", F.lit(str(s)), F.col(value_col))),
                            F.lit(width),
                        ).alias("cell"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sc"),
    ).select(value_col, "sc.seed", "sc.cell")
    return (
        probes.join(F.broadcast(sketch), ["seed", "cell"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` via a k-minimum-
    values sketch: est = (k-1) * 2^32 / h_(k) when the group has >= k
    distinct values, else the exact count (the sketch IS the full distinct
    set below k).

    Returns (group_col, distinct_est double, n_seen long).  n_seen = the
    number of sketch slots filled = min(k, exact distinct), so callers can
    tell estimated groups from exactly-counted ones.
    """
    if k < 2:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    hashed = (
        df.select(F.col(group_col), hash32(F.col(value_col)).alias("h"))
        .groupBy(group_col, "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    est = topk.groupBy(group_col).agg(
        F.max("h").alias("kth"), F.count("*").alias("n_seen")
    )
    return est.select(
        group_col,
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.round(F.lit((k - 1) * _HASH_SPACE) / F.col("kth"), 4))
        .alias("distinct_est"),
        "n_seen",
    )


def bloom_build(
    values: DataFrame, value_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom membership filter as (word, bits) rows — ``m_bits/32`` 32-bit
    words, ``k`` seeded md5 hash functions — the crawler's have-I-seen-
    this-URL structure, as bounded mergeable state.

    Same design contract as the CMS/KMV siblings: DETERMINISTIC (seeded
    md5 bit positions -> any engine rebuilds the identical words, so the
    filter sits under the exact DuckDB oracle) and MERGEABLE (two filters
    OR together; here the bitwise OR is a sum over DISTINCT (word, bit)
    contributions, which partial-aggregates map-side — the shuffle is
    O(m_bits), not O(rows)).  32-bit words inside int64 keep every value
    exactly representable in any engine's signed integer type.
    """
    if m_bits < 32 or m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if k < 1:
        raise ValueError(f"need k >= 1 hash functions, got {k}")
    pos = values.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        hash32(
                            F.concat_ws(":", F.lit(str(j)), F.col(value_col).cast("string"))
                        ),
                        F.lit(m_bits),
                    )
                    for j in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos DIV 32").alias("word"),
            F.pmod("pos", F.lit(32)).alias("bit"),
        )
        .distinct()
        .groupBy("word")
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """(value, maybe_present): 1 iff ALL k bit positions are set — no
    false negatives, deterministic false positives.  The probe side joins
    the O(m_bits) sketch on word (broadcastable at any realistic m_bits);
    the bit test is integer floor-div/mod, portable to any SQL engine."""
    pos = probes.select(
        F.col(value_col).alias("value"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        hash32(
                            F.concat_ws(":", F.lit(str(j)), F.col(value_col).cast("string"))
                        ),
                        F.lit(m_bits),
                    )
                    for j in range(k)
                ]
            )
        ).alias("pos"),
    ).select(
        "value",
        F.expr("pos DIV 32").alias("word"),
        F.pmod("pos", F.lit(32)).alias("bit"),
    )
    hit = (
        F.expr("(coalesce(bits, 0) DIV shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) % 2")
    )
    return (
        pos.join(F.broadcast(sketch), "word", "left")
        .select("value", hit.alias("hit"))
        .groupBy("value")
        # min(hit) == 1 <=> every probed position is set.  NOT sum == k:
        # a probe value appearing d times contributes d*k rows, so the sum
        # test read d*k and reported a member absent — a false negative
        # violating the Bloom contract (ADVICE r6).  min is duplicate-
        # insensitive and agrees with sum == k on distinct probes.
        .agg((F.min("hit") == 1).cast("long").alias("maybe_present"))
    )
