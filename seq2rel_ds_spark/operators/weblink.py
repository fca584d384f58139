"""Host-level web link graph: extract <a href> targets from raw page HTML
and aggregate them into (src_host, dst_host, n_links) edges.

Training-data-pipeline extension (SURVEY.md §2.10) — the reference has no
notion of the crawl graph, but a Common-Crawl-scale corpus pipeline needs
one: host-level link edges drive crawl prioritization, spam/SEO-farm
detection, and host quality ranks (the PageRank/label-propagation
operators in operators/graph.py consume exactly this edge shape).

Scale shape:
  * extraction is pure Catalyst (decode + regexp_extract_all + explode) —
    JVM-side, whole-stage-codegen'd, no Python in the hot path; the only
    shuffle is the final (src_host, dst_host) groupBy, which partial-
    aggregates map-side (host pairs repeat heavily within a partition, so
    the combine collapses the fan-out before the exchange).
  * hub hosts (every page links to facebook.com) skew the REDUCE side of
    a naive count; the groupBy here keys on the PAIR, whose cardinality
    is bounded by distinct (src, dst) combinations — the same two-phase
    salted pattern as operators/triples.py applies if a single pair ever
    dominates (documented, not needed for counts: partial aggregation
    already collapses per-partition duplicates of the hot pair).
  * regex, not an HTML parser: at 100 TB the per-page cost must stay in
    codegen; href="..." extraction over raw bytes is the standard
    WAT-extraction trade (misses unquoted/entity-mangled hrefs, which is
    acceptable for graph building and stated here).

The href regex and the host regex are shared verbatim by the DuckDB
oracle (both engines compile them identically: character classes and
alternation only, no engine-specific syntax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]+)"'
HOST_RE = r"^https?://([^/]+)"


def host_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_host, dst_host, n_links) over pages(url, html:binary).

    Relative and non-http(s) hrefs carry no host and are dropped;
    hosts are lowercased.  n_links counts anchor occurrences (a page
    linking the same host three times contributes 3).
    """
    html_s = F.decode(F.col(html_col), "utf-8")
    src = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    return (
        pages.select(
            src.alias("src_host"),
            F.explode(F.regexp_extract_all(html_s, F.lit(HREF_RE), 1)).alias("href"),
        )
        .select(
            "src_host",
            F.lower(F.regexp_extract(F.col("href"), HOST_RE, 1)).alias("dst_host"),
        )
        .filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_out_degree(edges: DataFrame) -> DataFrame:
    """(host, n_dst_hosts, n_links_out) — per-host fan-out summary over the
    edge table; one partial-aggregated shuffle on src_host."""
    return edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("n_dst_hosts"),
        F.sum("n_links").alias("n_links_out"),
    )


ANCHOR_RE = r'<a href="[^"]+"[^>]*>[^<]*</a>'


def anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_host, dst_host, anchor, n) — anchor TEXT aggregated per host
    pair: the classic anchor-text signal (what the web calls a page) that
    seeds entity-linking dictionaries and link-spam features.

    Same pure-Catalyst shape as host_links: one regex pass extracts whole
    ``<a>`` tags, a transform splits each into (href, text) — both
    regexes shared verbatim with the SQL oracle — and the only shuffle is
    the final partial-aggregated groupBy.  Anchors with relative /
    non-http(s) hrefs or empty text are dropped; text is trimmed,
    lowercased and capped at 64 chars (dictionary hygiene)."""
    html_s = F.decode(F.col(html_col), "utf-8")
    src = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    tags = pages.select(
        src.alias("src_host"),
        F.explode(F.regexp_extract_all(html_s, F.lit(ANCHOR_RE), 0)).alias("tag"),
    )
    return (
        tags.select(
            "src_host",
            F.lower(
                F.regexp_extract(F.regexp_extract("tag", HREF_RE, 1), HOST_RE, 1)
            ).alias("dst_host"),
            F.substring(
                F.trim(F.lower(F.regexp_extract("tag", r">([^<]*)</a>", 1))), 1, 64
            ).alias("anchor"),
        )
        .filter((F.col("src_host") != "") & (F.col("dst_host") != "") & (F.col("anchor") != ""))
        .groupBy("src_host", "dst_host", "anchor")
        .agg(F.count("*").alias("n"))
    )
