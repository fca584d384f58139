"""Connected components on an edge DataFrame — the coreference-cluster merge
for raw web text (north_star: the reference's gold-uid dict grouping,
util.py:211-217, replaced by a distributed graph job when uids are unknown).

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond") expressed purely as DataFrame joins and
aggregations:

    large-star: every node points its larger neighbors at its current
                minimum neighbor (or itself)
    small-star: every node points its smaller-or-equal neighbors at the
                minimum

Each iteration localCheckpoints the edge set (truncates lineage — mandatory
for iterative Spark jobs) and converges when the edge set stops changing
(count of changed rows == 0).  Component id = min node id in the component —
deterministic regardless of partitioning or iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edge list as (hi, lo) pairs with hi > lo, deduped."""
    e = edges.toDF("a", "b").filter(F.col("a") != F.col("b"))
    return (
        e.select(
            F.greatest("a", "b").alias("src"), F.least("a", "b").alias("dst")
        ).dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint_every: int = 1
) -> DataFrame:
    """edges(any two columns: src, dst) -> (node, component).

    Nodes are any orderable atomic type (use md5/int64 keys for balanced
    partitioning).  Isolated nodes don't appear in edges and therefore map to
    themselves implicitly; callers union them in if needed.
    """
    # state: parent pointers as (node -> min known neighbor)
    e = _canonical_edges(edges).localCheckpoint(eager=True)

    # order-free edge-set checksum (one aggregate job, no extra shuffle); the
    # hash sum runs in decimal(38,0) — summing raw int64 hashes overflows
    # long under ANSI mode.
    def _sig(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev_sig = _sig(e)
    converged = False
    for it in range(max_iter):
        # large-star + small-star in one combined round: for every node,
        # point all neighbors (and itself) at the minimum of the closed
        # neighborhood, then re-canonicalize.  This is the "alternating
        # star" contraction; each round at least halves tree heights.
        nbrs = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
            e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
        mins = mins.withColumn("m", F.least("u", "m"))
        # new edges: neighbor -> min(u's neighborhood)
        new_e = (
            nbrs.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(
                F.greatest("v", "m").alias("src"), F.least("v", "m").alias("dst")
            )
            .dropDuplicates(["src", "dst"])
        )
        if it % checkpoint_every == 0:
            new_e = new_e.localCheckpoint(eager=True)
        # convergence check reuses the cached previous signature — exactly
        # one aggregate job per iteration
        sig = _sig(new_e)
        e = new_e
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig

    if not converged:
        # an arbitrary parent pick here would silently mis-cluster; star
        # contraction converges in O(log^2 n) rounds, so hitting the cap
        # means the cap is too low for the graph — fail loudly.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter}; "
            "raise max_iter (rounds grow ~log^2 of the largest component)"
        )

    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    # ensure roots map to themselves
    roots = comp.select(F.col("component").alias("node")).distinct().join(
        comp.select(F.col("node")), "node", "left_anti"
    )
    return comp.unionByName(
        roots.withColumn("component", F.col("node"))
    ).dropDuplicates(["node"])
