"""Corpus-wide line-level deduplication (the C4 hygiene step): every
distinct line is kept only at its FIRST occurrence across the whole
corpus; all other occurrences — including repeats inside the same
document — are removed and the documents reassembled.

Training-data-pipeline extension (SURVEY.md §2.10) — document-level dedup
(operators/dedup.py) misses the dominant duplication mode of webtext:
boilerplate LINES (cookie banners, nav text, legal footers) repeated
across otherwise-distinct pages.  C4 removes them by keeping one
occurrence of each line corpus-wide; this operator reproduces that with
a deterministic, engine-portable owner rule.

Owner rule: occurrences are ordered by (md5('line:' || doc_id), pos) —
an arbitrary-but-stable total order independent of partitioning, input
order and engine; the minimum owns the line.

Scale shape:
  * lines travel as md5 hashes next to bounded (owner-key, pos) pairs;
    the owner election is ONE partial-aggregated groupBy(hash) — min of
    a struct, no distinct state, no window over the corpus.
  * the keep-decision is an equi-join of the line table against the
    winners on the hash (both sides hash-partitioned; the hot hash —
    one line repeated on every page — makes a 1-row build side per key,
    so the join itself cannot skew; AQE splits any straggler probe
    partition).
  * reassembly groups by doc id: per-task state is one document's lines
    (bounded by max doc size, the same bound mapInPandas already
    needs), then a sort_array + array_join inside the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """(doc_id, text_clean, n_lines, n_kept): documents with every
    non-owned duplicate line removed.  Lines shorter than ``min_chars``
    (e.g. blank separators) are exempt — always kept, never elected."""
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.concat(F.lit("line:"), F.col(id_col).cast("string"))).alias("dk"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    eligible = lines.filter(F.length("line") >= min_chars).select(
        "id", "dk", "pos", F.md5("line").alias("h")
    )
    winners = eligible.groupBy("h").agg(F.min(F.struct("dk", "pos")).alias("w"))
    kept = (
        lines.withColumn("h", F.md5("line"))
        .join(winners, "h", "left")
        .filter(
            (F.length("line") < min_chars)
            | ((F.col("w.dk") == F.col("dk")) & (F.col("w.pos") == F.col("pos")))
        )
    )
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
            F.count("*").alias("n_kept"),
        )
        .join(
            docs.select(
                F.col(id_col).alias("id"),
                F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
            ),
            "id",
            "right",
        )
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
