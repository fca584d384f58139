"""Tests: KMV distinct-count sketch (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F


class TestKMVSketch:
    def test_below_k_is_exact(self, spark):
        # fewer distinct values than k -> the sketch IS the distinct set
        rows = [("a", f"v{i % 7}") for i in range(100)]
        df = spark.createDataFrame(rows, "g string, v string")
        from seq2rel_ds_spark.operators.sketch import kmv_distinct

        out = kmv_distinct(df, "g", "v", k=64).collect()
        assert len(out) == 1
        assert out[0]["n_seen"] == 7
        assert out[0]["distinct_est"] == 7.0

    def test_estimate_accuracy_above_k(self, spark):
        # 2000 distinct values, k=64 -> KMV relative stderr ~ 1/sqrt(k-2)
        # ~ 12.7%; assert within 4 sigma so the test cannot flake
        rows = [("a", f"value-{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, "g string, v string")
        from seq2rel_ds_spark.operators.sketch import kmv_distinct

        out = kmv_distinct(df, "g", "v", k=64).collect()[0]
        assert out["n_seen"] == 64
        assert abs(out["distinct_est"] - 2000) / 2000 < 0.51

    def test_merge_invariance(self, spark):
        # the KMV estimate is a pure function of the value SET: duplicated
        # rows, different partitioning, and row order cannot change it —
        # the property that makes the sketch mergeable map-side
        rows = [("a", f"value-{i}") for i in range(500)]
        df1 = spark.createDataFrame(rows, "g string, v string").repartition(1)
        df2 = (
            spark.createDataFrame(rows + rows[:250], "g string, v string")
            .repartition(7, "v")
            .sort(F.desc("v"))
        )
        from seq2rel_ds_spark.operators.sketch import kmv_distinct

        e1 = kmv_distinct(df1, "g", "v", k=32).collect()[0]
        e2 = kmv_distinct(df2, "g", "v", k=32).collect()[0]
        assert e1["distinct_est"] == e2["distinct_est"]
        assert e1["n_seen"] == e2["n_seen"] == 32

    def test_k_validation(self, spark):
        df = spark.createDataFrame([("a", "x")], "g string, v string")
        from seq2rel_ds_spark.operators.sketch import kmv_distinct

        with pytest.raises(ValueError, match="k >= 2"):
            kmv_distinct(df, "g", "v", k=1)


class TestCountMinSketch:
    def _values(self, spark):
        # skewed multiset: v0 x100, v1 x10, 50 singletons; width=8 forces
        # heavy collisions so overestimation actually occurs
        rows = (
            [("v0",)] * 100 + [("v1",)] * 10 + [(f"rare-{i}",) for i in range(50)]
        )
        return spark.createDataFrame(rows, "v string")

    def test_never_underestimates(self, spark):
        from seq2rel_ds_spark.operators.sketch import cms_estimate, cms_table

        vals = self._values(spark)
        sketch = cms_table(vals, "v", depth=4, width=8)
        exact = {r["v"]: r["cnt"] for r in vals.groupBy("v").count().withColumnRenamed("count", "cnt").collect()}
        est = {
            r["v"]: r["cms_est"]
            for r in cms_estimate(
                sketch, vals.select("v").distinct(), "v", depth=4, width=8
            ).collect()
        }
        assert est.keys() == exact.keys()
        assert all(est[v] >= exact[v] for v in exact)
        # the heavy hitter dominates its cells: estimate stays tight-ish
        assert est["v0"] < 100 + 60  # can't exceed exact + all other mass

    def test_bounded_state_and_mergeability(self, spark):
        """depth*width rows max, and sketch(full) == cell-wise sum of
        sketches of disjoint halves — the map-side-combine property."""
        from pyspark.sql import functions as F

        from seq2rel_ds_spark.operators.sketch import cms_table

        vals = self._values(spark)
        full = cms_table(vals, "v", depth=4, width=8)
        assert full.count() <= 4 * 8
        half1 = cms_table(vals.limit(80), "v", depth=4, width=8)
        half2 = cms_table(vals.exceptAll(vals.limit(80)), "v", depth=4, width=8)
        merged = (
            half1.unionByName(half2)
            .groupBy("seed", "cell")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert {tuple(r) for r in merged.collect()} == {
            tuple(r) for r in full.collect()
        }

    def test_unseen_values_estimate_zero_or_collisions(self, spark):
        """Standard CMS semantics for values never inserted: an absent
        cell counts as 0, so a probe hashing to >= 1 empty cell returns
        estimate 0 — and NO probe may vanish from the output (ADVICE r5:
        the inner-join formulation dropped all-empty-cell probes and
        inflated partially-empty ones)."""
        from seq2rel_ds_spark.operators.sketch import cms_estimate, cms_table

        vals = self._values(spark)
        # wide sketch: unseen probes are near-certain to hit an empty cell
        sketch = cms_table(vals, "v", depth=4, width=4096)
        probes = spark.createDataFrame(
            [(f"never-seen-{i}",) for i in range(20)], "v string"
        )
        est = {
            r["v"]: r["cms_est"]
            for r in cms_estimate(sketch, probes, "v", depth=4, width=4096).collect()
        }
        # every probe present (none silently dropped) ...
        assert set(est) == {f"never-seen-{i}" for i in range(20)}
        # ... and with 52 distinct inserted values in 4096 cells per row,
        # an unseen value's 4 cells are all-nonzero with prob
        # ~(52/4096)^4 ~ 3e-8: all 20 estimate exactly 0
        assert all(v == 0 for v in est.values())

    def test_dims_validation(self, spark):
        from seq2rel_ds_spark.operators.sketch import cms_table

        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(ValueError, match="depth"):
            cms_table(df, "v", depth=0)


class TestBloom:
    def test_no_false_negatives_and_merge(self, spark):
        from seq2rel_ds_spark.operators.sketch import bloom_build, bloom_probe

        a = spark.createDataFrame([(f"k{i}",) for i in range(40)], "v string")
        b = spark.createDataFrame([(f"k{i}",) for i in range(40, 80)], "v string")
        both = a.union(b)
        # no false negatives
        probe = bloom_probe(bloom_build(both, "v", 512, 3), both, "v", 512, 3)
        assert all(r["maybe_present"] == 1 for r in probe.collect())
        # merge = bitwise OR of word rows == filter built over the union
        from pyspark.sql import functions as F

        merged = (
            bloom_build(a, "v", 512, 3)
            .union(bloom_build(b, "v", 512, 3))
            .groupBy("word")
            .agg(F.expr("CAST(bit_or(bits) AS BIGINT)").alias("bits"))
        )
        direct = {r["word"]: r["bits"] for r in bloom_build(both, "v", 512, 3).collect()}
        assert {r["word"]: r["bits"] for r in merged.collect()} == direct

    def test_duplicate_probe_values_keep_membership(self, spark):
        """A probe value appearing d times contributes d*k position rows;
        the membership verdict must not depend on d (the old sum(hit) == k
        aggregation read d*k and reported a true member absent)."""
        from seq2rel_ds_spark.operators.sketch import bloom_build, bloom_probe

        members = spark.createDataFrame([(f"k{i}",) for i in range(8)], "v string")
        dup_probes = spark.createDataFrame(
            [("k3",), ("k3",), ("k3",), ("miss-1",), ("miss-1",)], "v string"
        )
        got = {
            r["value"]: r["maybe_present"]
            for r in bloom_probe(
                bloom_build(members, "v", 512, 3), dup_probes, "v", 512, 3
            ).collect()
        }
        assert got["k3"] == 1  # member stays present however often probed
        # 8 values in 512 bits -> the miss stays absent w.h.p. (deterministic
        # hashes, fixed fixture: asserted as the concrete expected value)
        assert got["miss-1"] == 0

    def test_rejects_bad_params(self, spark):
        from seq2rel_ds_spark.operators.sketch import bloom_build

        df = spark.createDataFrame([("x",)], "v string")
        import pytest

        with pytest.raises(ValueError):
            bloom_build(df, "v", m_bits=100)  # not a multiple of 32
        with pytest.raises(ValueError):
            bloom_build(df, "v", k=0)
