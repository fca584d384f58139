"""Tests: URL canonicalization / crawl dedup (operators/url.py) and the
per-group token-budget cap (operators/mixing.py)."""

import datetime

import pytest
from pyspark.sql import functions as F


class TestCanonicalUrl:
    def test_rules(self, spark):
        from seq2rel_ds_spark.operators.url import with_canonical_url

        cases = [
            # fragment + default port + utm param
            ("http://Host.Example.com:80/a/b?utm_source=x&q=1#frag",
             "http://host.example.com/a/b?q=1"),
            # case-varied scheme/host, https default port
            ("HTTPS://WWW.SITE.ORG:443/Path?Q=2", "https://www.site.org/Path?Q=2"),
            # non-default port kept
            ("http://h.io:8080/x", "http://h.io:8080/x"),
            # empty path -> '/', all params tracking -> no query
            ("http://h.io?utm_medium=a&utm_campaign=b", "http://h.io/"),
            # fbclid/gclid dropped, order of kept params preserved
            ("https://h.io/p?a=1&fbclid=abc&b=2&gclid=d", "https://h.io/p?a=1&b=2"),
            # path case preserved, query '?' alone dropped
            ("http://h.io/CaseKept?", "http://h.io/CaseKept"),
        ]
        df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                                   "i long, url string")
        got = {r["i"]: r["url_canon"] for r in with_canonical_url(df).collect()}
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (cases[i][0], got[i])

    def test_crawl_dedup_latest_wins(self, spark):
        from seq2rel_ds_spark.operators.url import crawl_dedup

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            ("http://a.io/p#x", t0),
            ("http://A.IO/p", t0 + datetime.timedelta(days=2)),  # latest -> wins
            ("http://a.io:80/p?utm_source=s", t0 + datetime.timedelta(days=1)),
            ("http://b.io/q", t0),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
        out = {r["url_canon"]: r["url"] for r in crawl_dedup(df).collect()}
        assert out == {"http://a.io/p": "http://A.IO/p", "http://b.io/q": "http://b.io/q"}

    def test_crawl_dedup_tie_breaks_on_url(self, spark):
        from seq2rel_ds_spark.operators.url import crawl_dedup

        t0 = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("http://a.io/p?z=1#f1", t0), ("http://a.io/p?z=1#f2", t0)],
            "url string, warc_ts timestamp",
        )
        out = crawl_dedup(df).collect()
        assert len(out) == 1
        assert out[0]["url"] == "http://a.io/p?z=1#f2"  # desc url tie-break

    def test_crawl_dedup_hot_key_partial_aggregates(self, spark):
        """r07 skew posture: one canonical URL owning ~90% of the snapshot
        rows must (a) still resolve latest-wins exactly and (b) run as a
        partial-aggregated groupBy — each map task collapses the hot key
        to one candidate before the exchange — not as a window sort that
        ships every hot row to one partition."""
        import datetime

        from pyspark.sql import functions as F

        from seq2rel_ds_spark.operators.url import crawl_dedup

        t0 = datetime.datetime(2024, 1, 1)
        hot = [
            (f"http://hot.io/p?utm_source={i}", t0 + datetime.timedelta(minutes=i))
            for i in range(900)
        ]
        cold = [
            (f"http://c{i}.io/q", t0 + datetime.timedelta(minutes=i)) for i in range(100)
        ]
        df = spark.createDataFrame(
            hot + cold, "url string, warc_ts timestamp"
        ).repartition(8)
        out = crawl_dedup(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert "Window" not in plan
        assert "partial_max" in plan  # map-side combine collapses the hot key
        rows = {r["url_canon"]: (r["url"], r["warc_ts"]) for r in out.collect()}
        assert len(rows) == 101
        assert rows["http://hot.io/p"] == (
            "http://hot.io/p?utm_source=899",
            t0 + datetime.timedelta(minutes=899),
        )


class TestCapTokensPerGroup:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, "s" + str(i % 2), " ".join(["w"] * 10)) for i in range(10)],
            "doc_id long, source string, text string",
        )

    def test_quota_truncates_stream(self, spark):
        from seq2rel_ds_spark.operators.mixing import cap_tokens_per_group

        out = cap_tokens_per_group(self._docs(spark), "source", 30).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        for src, rows in by_src.items():
            kept = [r for r in rows if r["kept"] == 1]
            # 5 docs x 10 tokens, budget 30 -> exactly 3 kept per group
            assert len(kept) == 3, (src, rows)
            assert max(r["cum_tokens"] for r in kept) == 30
            # monotone: every kept cum <= every dropped cum
            dropped = [r["cum_tokens"] for r in rows if r["kept"] == 0]
            assert all(c > 30 for c in dropped)

    def test_budget_map_overrides(self, spark):
        from seq2rel_ds_spark.operators.mixing import cap_tokens_per_group

        out = cap_tokens_per_group(
            self._docs(spark), "source", 30, budgets={"s0": 50}
        ).collect()
        n_kept = {}
        for r in out:
            n_kept[r["source"]] = n_kept.get(r["source"], 0) + r["kept"]
        assert n_kept == {"s0": 5, "s1": 3}

    def test_deterministic_under_repartition(self, spark):
        from seq2rel_ds_spark.operators.mixing import cap_tokens_per_group

        docs = self._docs(spark)
        a = {r["doc_id"]: r["kept"] for r in cap_tokens_per_group(docs, "source", 30).collect()}
        b = {
            r["doc_id"]: r["kept"]
            for r in cap_tokens_per_group(docs.repartition(5), "source", 30).collect()
        }
        assert a == b

    def test_rejects_negative_budget(self, spark):
        from seq2rel_ds_spark.operators.mixing import cap_tokens_per_group

        with pytest.raises(ValueError):
            cap_tokens_per_group(self._docs(spark), "source", -1)


class TestLineDedup:
    def test_first_occurrence_wins_and_reassembly(self, spark):
        from seq2rel_ds_spark.operators.linededup import line_dedup

        docs = spark.createDataFrame(
            [
                (1, "unique one\nshared footer\n\nunique two"),
                (2, "shared footer\nunique three\nshared footer"),
                (3, "shared footer"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        # exactly ONE doc keeps 'shared footer' (md5-order owner), and the
        # intra-doc repeat in doc 2 is also collapsed
        n_footers = sum(r["text_clean"].count("shared footer") for r in out.values())
        assert n_footers == 1
        # empty line is exempt -> doc 1 keeps its blank separator
        assert "\n\n" in out[1]["text_clean"] or out[1]["text_clean"].endswith("\n")
        # line counts: originals 4/3/1
        assert (out[1]["n_lines"], out[2]["n_lines"], out[3]["n_lines"]) == (4, 3, 1)
        # uniques always survive
        assert "unique one" in out[1]["text_clean"]
        assert "unique three" in out[2]["text_clean"]
        # a doc that loses everything reassembles to '' with n_kept 0
        losers = [r for r in out.values() if r["n_kept"] == 0]
        assert all(r["text_clean"] == "" for r in losers)
        # conservation: kept line totals = distinct lines + exempt blanks
        assert sum(r["n_kept"] for r in out.values()) == 5  # 4 distinct + 1 blank

    def test_partitioning_invariance(self, spark):
        from seq2rel_ds_spark.operators.linededup import line_dedup

        docs = spark.createDataFrame(
            [(i, "common line\nrow " + str(i % 7)) for i in range(30)],
            "doc_id long, text string",
        )
        a = {r["doc_id"]: r["text_clean"] for r in line_dedup(docs).collect()}
        b = {r["doc_id"]: r["text_clean"] for r in line_dedup(docs.repartition(11)).collect()}
        assert a == b
        assert sum(t.count("common line") for t in a.values()) == 1
        assert sum(t.count("row 3") for t in a.values()) == 1
