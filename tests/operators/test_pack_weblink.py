"""Tests: sequence packing (operators/pack.py), host link graph
(operators/weblink.py) and the composite quality filter
(operators/textstats.py::with_filter_flags)."""

import pytest
from pyspark.sql import functions as F


class TestPackAssign:
    def test_offsets_within_one_bucket(self, spark):
        from seq2rel_ds_spark.operators.pack import pack_assign

        docs = spark.createDataFrame(
            [(i, " ".join(["tok"] * (10 * (i + 1)))) for i in range(6)],
            "doc_id long, text string",
        )
        out = pack_assign(docs, ctx=16, n_buckets=1).orderBy("start_off").collect()
        # one bucket -> offsets are a permutation-ordered exact prefix sum
        assert out[0]["start_off"] == 0
        for prev, cur in zip(out, out[1:]):
            assert cur["start_off"] == prev["start_off"] + prev["n_tokens"]
        total = out[-1]["start_off"] + out[-1]["n_tokens"]
        assert total == sum(10 * (i + 1) for i in range(6))
        for r in out:
            assert r["pack_idx"] == r["start_off"] // 16
            assert r["pack_off"] == r["start_off"] % 16

    def test_bucket_independence_and_determinism(self, spark):
        from seq2rel_ds_spark.operators.pack import pack_assign

        docs = spark.createDataFrame(
            [(i, "a b c d e") for i in range(40)], "doc_id long, text string"
        )
        a = {r["doc_id"]: r for r in pack_assign(docs, ctx=8, n_buckets=4).collect()}
        b = {
            r["doc_id"]: r
            for r in pack_assign(docs.repartition(7), ctx=8, n_buckets=4).collect()
        }
        # identical assignment regardless of input partitioning
        for i in range(40):
            assert (a[i]["bucket"], a[i]["start_off"]) == (b[i]["bucket"], b[i]["start_off"])
        # every bucket's offsets start at 0 (bucket-local concatenation)
        per_bucket_min = {}
        for r in a.values():
            per_bucket_min[r["bucket"]] = min(
                per_bucket_min.get(r["bucket"], 1 << 60), r["start_off"]
            )
        assert set(per_bucket_min.values()) == {0}

    def test_rejects_bad_params(self, spark):
        from seq2rel_ds_spark.operators.pack import pack_assign

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pack_assign(docs, ctx=0)
        with pytest.raises(ValueError):
            pack_assign(docs, n_buckets=0)


class TestHostLinks:
    def _pages(self, spark):
        rows = [
            (
                "https://A.example.com/page1",
                b'<html><a href="https://b.example.com/x">1</a>'
                b'<a href="https://b.example.com/y">2</a>'
                b'<a href="/relative">skip</a>'
                b'<a href="mailto:x@y.z">skip</a>'
                b'<a href="http://c.example.com/">3</a></html>',
            ),
            (
                "http://b.example.com/p",
                b'<a href="https://B.example.com/self">self</a>no links otherwise',
            ),
            ("not-a-url", b'<a href="https://d.example.com/">orphan</a>'),
        ]
        return spark.createDataFrame(rows, "url string, html binary")

    def test_edges(self, spark):
        from seq2rel_ds_spark.operators.weblink import host_links

        got = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in host_links(self._pages(spark)).collect()
        }
        # multiplicity counted; hosts lowercased; relative/mailto dropped;
        # the src with no parseable host contributes nothing
        assert got == {
            ("a.example.com", "b.example.com"): 2,
            ("a.example.com", "c.example.com"): 1,
            ("b.example.com", "b.example.com"): 1,
        }

    def test_out_degree(self, spark):
        from seq2rel_ds_spark.operators.weblink import host_links, host_out_degree

        deg = {
            r["host"]: (r["n_dst_hosts"], r["n_links_out"])
            for r in host_out_degree(host_links(self._pages(spark))).collect()
        }
        assert deg["a.example.com"] == (2, 3)
        assert deg["b.example.com"] == (1, 1)


class TestFilterFlags:
    def test_rules(self, spark):
        from seq2rel_ds_spark.operators.textstats import with_filter_flags

        # 20 tokens, stopword-rich, every trigram distinct (each contains a
        # unique content word), avg token length ~3.5
        long_clean = (
            "the alpha of beta and gamma to delta in epsilon "
            "a zeta the eta of theta and iota to kappa"
        )
        docs = spark.createDataFrame(
            [
                (1, "too short"),
                (2, long_clean),
                (3, " ".join(["spam spam spam"] * 15)),  # dup trigrams, no stopwords
                (4, " ".join(["supercalifragilistic"] * 30)),  # avg len 20 > 8.0
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in with_filter_flags(
                docs,
                min_tokens=15,
                max_tokens=400,
                avg_len_lo_x10=20,
                avg_len_hi_x10=80,
                dup3_pct_max=10,
                stop_per_64_min=2,
            ).collect()
        }
        assert out[1]["f_short"] == 1 and out[1]["keep"] == 0
        assert out[2]["keep"] == 1, dict(out[2].asDict())
        assert out[3]["f_dup3"] == 1 and out[3]["f_stop"] == 1 and out[3]["keep"] == 0
        assert out[4]["f_wordlen"] == 1 and out[4]["keep"] == 0

    def test_integer_threshold_edges(self, spark):
        from seq2rel_ds_spark.operators.textstats import with_filter_flags

        # exactly min_tokens -> not short; one under -> short
        docs = spark.createDataFrame(
            [(1, " ".join(["the"] * 5)), (2, " ".join(["the"] * 4))],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["f_short"]
            for r in with_filter_flags(docs, min_tokens=5).collect()
        }
        assert out == {1: 0, 2: 1}


class TestBoilerplate:
    def test_dictionary_and_fractions(self, spark):
        from seq2rel_ds_spark.operators.boilerplate import (
            boilerplate_shingles,
            with_boilerplate_frac,
        )

        footer = "subscribe to our newsletter"
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma " + footer),
                (2, "delta epsilon zeta " + footer),
                (3, "eta theta iota " + footer),
                (4, "kappa lambdaword muon unique tail words"),
            ],
            "doc_id long, text string",
        )
        # footer trigrams appear in 3 docs; content trigrams in 1
        dic = boilerplate_shingles(docs, n=3, min_docs=3).collect()
        assert all(r["df"] == 3 for r in dic)
        # "subscribe to our", "to our newsletter" plus the two bridge
        # trigrams differ per doc -> exactly 2 shared trigrams
        assert len(dic) == 2

        frac = {
            r["doc_id"]: (r["n_boiler"], r["n_shingles"], r["boiler_frac"])
            for r in with_boilerplate_frac(docs, n=3, min_docs=3).collect()
        }
        # doc 1: 7 tokens -> 5 trigrams, 2 boilerplate
        assert frac[1] == (2, 5, 0.4)
        assert frac[4] == (0, 4, 0.0)  # zero-hit doc still present


class TestAnchorTexts:
    def test_extraction_and_hygiene(self, spark):
        from seq2rel_ds_spark.operators.weblink import anchor_texts

        long_text = "x" * 100
        rows = [
            (
                "https://src.io/p",
                (
                    '<a href="https://A.io/1" rel="nofollow">Click  Here</a>'
                    '<a href="https://a.io/2">click  here</a>'
                    '<a href="/rel">relative dropped</a>'
                    '<a href="https://b.io/"></a>'
                    f'<a href="https://c.io/">{long_text}</a>'
                ).encode(),
            ),
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        got = {
            (r["dst_host"], r["anchor"]): r["n"] for r in anchor_texts(df).collect()
        }
        # case-folded text aggregates across the two a.io anchors
        assert got[("a.io", "click  here")] == 2
        # 64-char cap
        assert ("c.io", "x" * 64) in got
        # relative + empty-text dropped
        assert all(h != "b.io" for h, _ in got)
        assert len(got) == 2


class TestRarityScore:
    def test_integer_rarity(self, spark):
        from seq2rel_ds_spark.operators.textstats import with_rarity_score

        docs = spark.createDataFrame(
            [
                (1, "common common unique1"),
                (2, "common unique2"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in with_rarity_score(docs, scale=100).collect()}
        # df: common=2, unique1=1, unique2=1 -> per-occurrence 100//2=50, 100//1=100
        assert (out[1]["rarity_sum"], out[1]["n_tokens"]) == (50 + 50 + 100, 3)
        assert out[1]["rarity_per_token"] == 200 // 3
        assert (out[2]["rarity_sum"], out[2]["rarity_per_token"]) == (150, 75)
