"""Tests: bucketed interval join (operators/interval.py)."""

import pytest
from pyspark.sql import functions as F

H = 3_600_000_000  # 1h in micros


class TestIntervalJoin:
    def _data(self, spark):
        # intervals: (iid, key, start, end) — crafted to cross bucket
        # boundaries and to touch edges exactly
        intervals = spark.createDataFrame(
            [
                (1, "u1", 10 * H + 1, 11 * H),       # crosses 10h->11h boundary
                (2, "u1", 5 * H, 5 * H + 100),       # tiny, single bucket
                (3, "u2", 10 * H + 1, 11 * H),       # same window, other key
            ],
            "iid long, key string, start long, end long",
        )
        events = spark.createDataFrame(
            [
                (100, "u1", 10 * H + 1),   # == start (inclusive)
                (101, "u1", 11 * H),       # == end (inclusive), next bucket
                (102, "u1", 11 * H + 1),   # just past end
                (103, "u1", 10 * H),       # just before start
                (104, "u1", 5 * H + 50),   # inside tiny interval
                (105, "u2", 10 * H + 500), # matches iid 3 only (key)
                (106, "u3", 10 * H + 500), # no interval for key
            ],
            "eid long, key string, ts long",
        )
        return events, intervals

    def test_matches_naive_theta_join(self, spark):
        from seq2rel_ds_spark.operators.interval import interval_join

        events, intervals = self._data(spark)
        got = {
            (r["eid"], r["iid"])
            for r in interval_join(
                events, intervals, ["key"], "ts", "start", "end"
            ).collect()
        }
        naive = {
            (r["eid"], r["iid"])
            for r in events.alias("e")
            .join(
                intervals.alias("i"),
                (F.col("e.key") == F.col("i.key"))
                & (F.col("e.ts") >= F.col("i.start"))
                & (F.col("e.ts") <= F.col("i.end")),
            )
            .collect()
        }
        assert got == naive
        assert got == {(100, 1), (101, 1), (104, 2), (105, 3)}

    def test_no_duplicate_pairs(self, spark):
        from seq2rel_ds_spark.operators.interval import interval_join

        events, intervals = self._data(spark)
        out = interval_join(events, intervals, ["key"], "ts", "start", "end")
        assert out.count() == out.select("eid", "iid").distinct().count()

    def test_caller_bucket_column_survives(self, spark):
        """An input that already carries a `_bucket` column keeps it
        (value-intact) in the result — the working column picks a free
        name instead of overwriting and dropping the caller's (ADVICE
        r5)."""
        from seq2rel_ds_spark.operators.interval import interval_join

        events, intervals = self._data(spark)
        ev = events.withColumn("_bucket", F.col("eid") * 10)
        iv = intervals.withColumn("_bucket", F.lit(-1))
        out = interval_join(ev.drop("_bucket"), iv, ["key"], "ts", "start", "end")
        assert "_bucket" in out.columns  # intervals-side column preserved
        assert all(r["_bucket"] == -1 for r in out.collect())
        out2 = interval_join(ev, intervals, ["key"], "ts", "start", "end")
        assert {(r["eid"], r["_bucket"]) for r in out2.collect()} == {
            (r["eid"], r["eid"] * 10) for r in out2.collect()
        }

    def test_bucket_width_validation(self, spark):
        from seq2rel_ds_spark.operators.interval import interval_join

        events, intervals = self._data(spark)
        with pytest.raises(ValueError, match="positive"):
            interval_join(events, intervals, ["key"], "ts", "start", "end", 0)
