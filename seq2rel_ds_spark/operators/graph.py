"""Iterative graph analytics over the materialized KG edge list.

``pagerank`` is the production-shape loop behind the fixed-unrolled
``kg_pagerank`` correctness gate (__spark_entry__.py): identical per-round
dataflow — ONE shuffle per iteration (groupBy dst) plus a join keyed on
src against the static degree-annotated edge list — but iterated a
caller-chosen number of rounds with ``localCheckpoint`` lineage truncation
every ``checkpoint_every`` rounds, the same discipline
``operators/cluster.py`` uses for connected components.  Without
truncation each round nests the previous round's plan, so the optimizer
re-analyzes an exponentially-wrapping tree and task binaries grow without
bound; with it, plan size is O(checkpoint interval) forever — the property
pinned by tests/operators/test_graph_rank.py.

Scale notes (100 TB / 10^10-edge posture):
  * the degree-annotated edge list is checkpointed ONCE and re-read every
    round — it is the static side, analogous to a cached adjacency table;
    on a real cluster persist it partitioned by src so the per-round join
    co-locates without a full shuffle of the big side
  * the node count is a one-scalar setup aggregate, folded into literals
    (no per-round broadcast)
  * every node must have out-degree >= 1 AND in-degree >= 1 (both hold
    automatically for undirected doubling — the KG co-occurrence graph's
    shape).  Out-degree 0 (dangling) would leak rank mass; in-degree 0
    would drop the node from the output after round 1, because each
    round rebuilds ranks from groupBy(dst) and a never-dst node receives
    no contributions (true PageRank would keep it at (1-d)/n).  Both
    redistributions are deliberately out of scope, matching the gate's
    semantics — callers with general directed edges should pre-add
    self-loops or symmetrize first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 20,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges(src, dst) -> (node, rank), ``n_iter`` power-iteration rounds.

    Requires every node to appear as BOTH src and dst (see module
    docstring; undirected-doubled inputs satisfy this by construction).
    Row-identical (at 6 dp) to the unrolled gate computation for the same
    iteration count — pinned by test_graph_rank.py on a >=100k-edge graph.
    """
    e = edges.select("src", "dst")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # static per-round join side: checkpoint once, reuse every iteration
    edges_deg = e.join(deg, "src").localCheckpoint(eager=True)
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.select(F.col("src").alias("node"), F.lit(0.0).alias("rank"))

    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    )
    for i in range(n_iter):
        contrib = edges_deg.join(ranks, edges_deg["src"] == ranks["node"]).select(
            "dst", (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit((1.0 - damping) / n_nodes) + F.lit(damping) * F.col("s")
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(
    edges: DataFrame,
    max_iter: int = 50,
) -> DataFrame:
    """edges(src, dst) -> (node, label): synchronous MIN-label propagation
    run to a FIXED POINT — the production loop behind the fixed-unrolled
    ``kg_label_propagation`` gate (__spark_entry__.py), which runs this
    exact per-round dataflow 2 unrolled rounds for the oracle.  Pass both
    edge directions for undirected community detection (the gate's
    strong-edge subgraph is doubled); at the fixed point of an undirected
    graph every node carries its connected component's minimum node id.

    Per round: ONE equi-join of the node-sized label set against the
    static edge list + one groupBy-min shuffle — the kg_bfs_reach cost
    envelope.  Labels are seeded from src nodes (label = own id); a
    dst-only node is adopted into the label set on its first round with
    the min of its in-neighbors' labels, mirroring the gate.

    Checkpoint discipline: the new label set is ``localCheckpoint``-ed
    EVERY round, like ``bfs_distances``' frontier below — the eager
    materialization doubles as the fixed-point test's evaluation (the
    convergence join would otherwise recompute the whole round lineage,
    O(i^2) total), and it truncates the plan so round i's tree never
    nests rounds 0..i-1.  The set is node-sized, not edge-sized, so the
    per-round checkpoint write is the small side of the loop.

    Convergence: min-propagation is monotone non-increasing per node, so
    the fixed point is reached exactly when no node's label drops in a
    round (checked with a node-keyed left join + isEmpty — a bounded
    limit-1 scan, not a count).
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = e.join(labels, e["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "label"
        )
        nxt = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # left join: a node first adopted this round (dst-only, absent
        # from the previous label set) counts as changed
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "node", "left")
            .filter(
                F.col("o.label").isNull() | (F.col("n.label") < F.col("o.label"))
            )
        )
        done = changed.isEmpty()
        labels = nxt
        if done:
            break
    return labels


def bfs_distances(
    edges: DataFrame,
    source,
    max_iter: int = 30,
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges(src, dst), directed -> (node, dist): minimum hop count from
    ``source`` for every node reachable within ``max_iter`` hops.

    Production-shape FRONTIER loop behind the fixed-unrolled
    ``kg_bfs_reach`` gate (__spark_entry__.py).  The gate's Bellman-Ford
    relaxation re-aggregates the ENTIRE distance set every round (fine
    unrolled-3, oracle-friendly); the frontier loop joins only the rows
    discovered last round — per-round cost is O(frontier-adjacent edges),
    the BFS shape that works on a 10^10-edge graph where whole-set
    relaxation re-shuffles everything every hop.  An anti-join against the
    settled set keeps each node's FIRST (minimal) discovery, frontier
    checkpointing doubles as the empty-frontier termination action, and
    the settled set is lineage-truncated every ``checkpoint_every`` rounds
    like ``pagerank`` above.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    # seed = the source node if it exists anywhere in the edge list
    # (empty result for an unknown source, rather than a phantom row)
    frontier = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .filter(F.col("node") == source)
        .limit(1)
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for i in range(max_iter):
        nxt = (
            e.join(frontier, e["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(i + 1))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        if (i + 1) % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
        frontier = nxt
    return dist
