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
