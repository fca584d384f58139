"""Semantic checks for the iterative / ranking gate entries (kg_pagerank,
tfidf_top_terms) beyond the DuckDB oracle: invariants the SQL twin shares
by construction, so a shared misunderstanding cannot hide behind a green
hash match.
"""

import math

SF = "/root/testdata/sf0.001"


class TestPageRank:
    def test_mass_conserved(self, spark):
        """With no dangling nodes (undirected doubling), total rank mass
        stays 1 at every iteration: sum of ranks after 3 rounds == 1."""
        import __spark_entry__ as em

        rows = em.q_kg_pagerank(spark, SF).collect()
        assert rows, "pagerank returned no nodes"
        assert math.isclose(sum(r["pagerank"] for r in rows), 1.0, abs_tol=1e-4)

    def test_floor_and_node_set(self, spark):
        """Every node scores above the damping floor (1-d)/N, and the node
        set equals the co-occurrence graph's node set."""
        import __spark_entry__ as em

        pr = em.q_kg_pagerank(spark, SF).collect()
        n = len(pr)
        floor = 0.15 / n
        assert all(r["pagerank"] > floor - 1e-9 for r in pr)
        co = em.q_kg_cooccurrence(spark, SF).collect()
        nodes = {r["subj"] for r in co} | {r["obj"] for r in co}
        assert {r["node"] for r in pr} == nodes


class TestProductionPageRank:
    """The checkpointed-iteration loop (operators/graph.py) vs the unrolled
    gate dataflow — parity at a size where lineage growth matters."""

    @staticmethod
    def _edges(spark, n_base: int, n_nodes: int):
        """Deterministic undirected synthetic graph (doubling + dedup)."""
        from pyspark.sql import functions as F

        base = (
            spark.range(n_base)
            .select(
                (F.col("id") % n_nodes).alias("a"),
                # the id//n term varies b across same-a rows (a plain
                # affine map collapses mod n_nodes)
                ((F.col("id") * 7 + (F.col("id") / n_nodes).cast("long") * 31 + 3) % n_nodes).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
        )
        return (
            base.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                        F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .dropDuplicates(["src", "dst"])
        )

    def test_parity_with_unrolled_at_100k_edges(self, spark):
        """graph.pagerank (localCheckpoint every 2 rounds, so truncation
        fires mid-run) matches the gate's unrolled-3 dataflow node-for-node
        on a >=100k-edge graph.  Tolerance 1e-12 on ranks ~1e-4: the two
        plans may legally sum shuffle partials in different orders, so we
        allow summation-order ulps (~1e-17) and nothing more."""
        import math

        from pyspark.sql import functions as F

        from seq2rel_ds_spark.operators.graph import pagerank

        e = self._edges(spark, 60_000, 20_000)
        assert e.count() >= 100_000

        # unrolled reference: the gate's exact dataflow (broadcast-1-row
        # node count, 3 unrolled rounds, no checkpointing)
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        nn = deg.agg(F.count("*").alias("n_nodes"))
        edges = e.join(deg, "src")
        ranks = deg.crossJoin(F.broadcast(nn)).select(
            F.col("src").alias("node"), (F.lit(1.0) / F.col("n_nodes")).alias("rank")
        )
        for _ in range(3):
            contrib = edges.join(ranks, edges["src"] == ranks["node"]).select(
                "dst", (F.col("rank") / F.col("deg")).alias("c")
            )
            ranks = (
                contrib.groupBy("dst")
                .agg(F.sum("c").alias("s"))
                .crossJoin(F.broadcast(nn))
                .select(
                    F.col("dst").alias("node"),
                    (F.lit(0.15) / F.col("n_nodes") + F.lit(0.85) * F.col("s")).alias("rank"),
                )
            )
        want = {r["node"]: r["rank"] for r in ranks.collect()}

        got = {
            r["node"]: r["rank"]
            for r in pagerank(e, n_iter=3, checkpoint_every=2).collect()
        }
        assert got.keys() == want.keys()
        assert all(math.isclose(got[k], want[k], abs_tol=1e-12) for k in want)

    def test_lineage_stays_bounded(self, spark):
        """The point of the checkpoint discipline: after 10 rounds the
        checkpointed loop's plan is truncated at the last localCheckpoint
        (a LogicalRDD leaf), while the unchecked loop's plan keeps the
        whole 10-round tree — orders of magnitude larger."""
        from seq2rel_ds_spark.operators.graph import pagerank

        e = self._edges(spark, 300, 100)
        ck = pagerank(e, n_iter=10, checkpoint_every=5)
        no_ck = pagerank(e, n_iter=10, checkpoint_every=100)
        plan_ck = ck._jdf.queryExecution().optimizedPlan().toString()
        plan_no = no_ck._jdf.queryExecution().optimizedPlan().toString()
        # the loop's rank state must be a checkpoint leaf, not the nested
        # 10-round tree (edges_deg is LogicalRDD in both — compare sizes)
        assert "LogicalRDD [node" in plan_ck
        assert len(plan_ck) < len(plan_no) / 2

    def test_mass_conserved_long_run(self, spark):
        """20 checkpointed rounds keep total rank mass at 1 (no dangling
        mass leak across checkpoint boundaries)."""
        import math

        from seq2rel_ds_spark.operators.graph import pagerank

        e = self._edges(spark, 600, 200)
        rows = pagerank(e, n_iter=20, checkpoint_every=5).collect()
        assert math.isclose(sum(r["rank"] for r in rows), 1.0, abs_tol=1e-6)


class TestProductionBFS:
    """The frontier loop (operators/graph.py::bfs_distances) vs the gate's
    whole-set Bellman-Ford relaxation — same distances, early termination,
    bounded lineage via per-round frontier checkpoints."""

    def test_matches_whole_set_relaxation(self, spark):
        """Frontier BFS == the kg_bfs_reach-style relaxation run to a fixed
        point, on a 2k-node undirected graph (exact integer match)."""
        from pyspark.sql import functions as F

        from seq2rel_ds_spark.operators.graph import bfs_distances

        e = TestProductionPageRank._edges(spark, 6_000, 2_000)
        src = e.agg(F.min("src")).collect()[0][0]

        # reference: monotone min-relaxation over the FULL set per round,
        # iterated past the graph diameter
        dist = e.agg(F.min("src").alias("node")).withColumn("dist", F.lit(0))
        for _ in range(12):
            hop = e.join(dist, e["src"] == dist["node"]).select(
                F.col("dst").alias("node"), (F.col("dist") + F.lit(1)).alias("dist")
            )
            dist = (
                dist.unionByName(hop)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
        want = {r["node"]: r["dist"] for r in dist.collect()}

        got = {
            r["node"]: r["dist"]
            for r in bfs_distances(e, src, max_iter=20).collect()
        }
        assert got == want

    def test_unknown_source_is_empty(self, spark):
        from seq2rel_ds_spark.operators.graph import bfs_distances

        e = TestProductionPageRank._edges(spark, 300, 100)
        assert bfs_distances(e, 10**9, max_iter=5).count() == 0


class TestProductionLabelPropagation:
    """The fixed-point loop (operators/graph.py::label_propagation) vs the
    kg_label_propagation gate's 2-round unrolled dataflow — exact label
    parity when capped at the gate's round count, true convergence on a
    >=100k-edge multi-community graph, bounded lineage."""

    @staticmethod
    def _block_edges(spark, n_nodes: int, block: int):
        """Disjoint rings of `block` nodes (undirected-doubled): the
        min-LP fixed point labels every node with its block's minimum,
        and ring diameter block//2 forces multiple propagation rounds."""
        from pyspark.sql import functions as F

        base = spark.range(n_nodes).select(
            F.col("id").alias("a"),
            # successor within the ring: wraps to the block's first node
            (
                (F.col("id") - F.col("id") % block)
                + (F.col("id") % block + 1) % block
            ).alias("b"),
        )
        return base.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    def test_parity_with_unrolled_gate_at_2_rounds(self, spark):
        """label_propagation(max_iter=2) == the gate's exact 2-round
        unrolled dataflow, label-for-label (integer min labels — exact
        equality, no float tolerance), on a >=100k-edge graph."""
        from pyspark.sql import functions as F

        from seq2rel_ds_spark.operators.graph import label_propagation

        e = TestProductionPageRank._edges(spark, 60_000, 20_000)
        assert e.count() >= 100_000

        labels = e.select(F.col("src").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
        for _ in range(2):
            neigh = e.join(labels, e["src"] == labels["node"]).select(
                F.col("dst").alias("node"), "label"
            )
            labels = (
                labels.unionByName(neigh)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
        want = {r["node"]: r["label"] for r in labels.collect()}

        got = {
            r["node"]: r["label"]
            for r in label_propagation(e, max_iter=2).collect()
        }
        assert got == want

    def test_converges_to_component_minima(self, spark):
        """Run to the fixed point on 100k+ doubled ring edges split into
        50k-node / 8-node-block communities: every node must carry its
        block's minimum id (requires >= 4 propagation rounds — beyond the
        gate's unroll depth — and early termination well under max_iter)."""
        from seq2rel_ds_spark.operators.graph import label_propagation

        e = self._block_edges(spark, 56_000, 8)
        assert e.count() >= 100_000
        rows = label_propagation(e, max_iter=20).collect()
        assert len(rows) == 56_000
        assert all(r["label"] == r["node"] - r["node"] % 8 for r in rows)

    def test_lineage_stays_bounded(self, spark):
        """The per-round localCheckpoint truncates the plan: the returned
        label set's optimized plan is rooted at a checkpoint leaf, not a
        nested max_iter-round tree."""
        from seq2rel_ds_spark.operators.graph import label_propagation

        e = self._block_edges(spark, 800, 8)
        out = label_propagation(e, max_iter=10)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan
        # a checkpoint leaf, not the unrolled loop: no join survives
        assert "Join" not in plan


class TestTfIdf:
    def test_topk_shape_and_order(self, spark):
        """<= 3 rows per doc, rk dense from 1, and rows ordered by the
        rounded score desc / token asc within each doc."""
        import __spark_entry__ as em

        rows = em.q_tfidf_top_terms(spark, SF).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert by_doc
        for doc, rs in by_doc.items():
            rs.sort(key=lambda r: r["rk"])
            assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            keys = [(-r["score"], r["token"]) for r in rs]
            assert keys == sorted(keys), doc

    def test_df_matches_postings(self, spark):
        """The df column must agree with the inverted index's df for every
        token that appears in the top-k."""
        import __spark_entry__ as em

        post = {
            r["token"]: r["df"] for r in em.q_token_postings(spark, SF).collect()
        }
        for r in em.q_tfidf_top_terms(spark, SF).collect():
            assert post[r["token"]] == r["df"], r["token"]
