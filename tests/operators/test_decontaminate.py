"""Tests: eval-set decontamination (operators/decontaminate.py) and
intra-doc repetition stats (operators/textstats.py::with_repetition_stats)."""

from pyspark.sql import functions as F


class TestDecontaminate:
    def _corpora(self, spark):
        eval_docs = spark.createDataFrame(
            [(900, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [
                # verbatim leak of an eval trigram span
                (1, "intro text the quick brown fox jumps outro text"),
                # clean: shares words but no trigram
                (2, "quick dog brown lazy fox the over jumps"),
                # another leak, smaller overlap
                (3, "over the lazy dog indeed"),
            ],
            "doc_id long, text string",
        )
        return train, eval_docs

    def test_contamination_counts(self, spark):
        from seq2rel_ds_spark.operators.decontaminate import ngram_contamination

        train, ev = self._corpora(spark)
        got = {
            r["doc_id"]: (r["n_dirty_shingles"], r["n_shingles"])
            for r in ngram_contamination(train, ev, n=3).collect()
        }
        # doc 1: trigrams of "the quick brown fox jumps" inside the eval
        # doc: "the quick brown", "quick brown fox", "brown fox jumps" = 3
        # dirty of its 7 distinct trigrams (9 tokens)
        assert got[1] == (3, 7)
        # doc 3: "over the lazy", "the lazy dog" = 2 dirty of 3
        assert got[3] == (2, 3)
        # doc 2 shares NO trigram -> absent (output is overlap-sized)
        assert 2 not in got

    def test_decontaminate_filters(self, spark):
        from seq2rel_ds_spark.operators.decontaminate import decontaminate

        train, ev = self._corpora(spark)
        kept = {r["doc_id"] for r in decontaminate(train, ev, n=3).collect()}
        assert kept == {2}
        # loose threshold keeps the small-overlap doc too
        kept_loose = {
            r["doc_id"]
            for r in decontaminate(train, ev, n=3, max_dirty_frac=0.5).collect()
        }
        assert kept_loose == {1, 2}

    def test_eval_side_broadcasts_and_no_cartesian(self, spark):
        """The scale contract: the eval shingle set must broadcast and the
        plan must be free of cartesian/BNLJ shapes."""
        from seq2rel_ds_spark.operators.decontaminate import ngram_contamination

        train, ev = self._corpora(spark)
        plan = (
            ngram_contamination(train, ev, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRepetitionStats:
    def test_crafted_fractions(self, spark):
        from seq2rel_ds_spark.operators.textstats import with_repetition_stats

        docs = spark.createDataFrame(
            [
                (1, "a a a b"),          # 4 tokens, 2 distinct -> 0.5 dup
                (2, "x y z x y z x y z"),  # trigram loop
                (3, "all distinct words here"),
                (4, "ab"),               # < 3 tokens: trigram frac 0.0
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["dup_token_frac"],
                r["dup_trigram_frac"],
            )
            for r in with_repetition_stats(docs).collect()
        }
        assert got[1] == (4, 0.5, 0.0)  # trigrams "a a a","a a b" distinct
        # 9 tokens -> 7 trigrams, 3 distinct ("x y z","y z x","z x y")
        assert got[2] == (9, round(1 - 3 / 9, 4), round(1 - 3 / 7, 4))
        assert got[3] == (4, 0.0, 0.0)
        assert got[4] == (1, 0.0, 0.0)
