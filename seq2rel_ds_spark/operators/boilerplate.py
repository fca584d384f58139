"""Cross-document boilerplate detection: word n-gram spans repeated across
many documents (nav bars, cookie banners, site footers) and the per-document
fraction of such spans.

Training-data-pipeline extension (SURVEY.md §2.10) — the CCNet/RefinedWeb
hygiene step the reference has no counterpart for: template text repeated
across a site dominates naive token counts and poisons dedup similarity;
pipelines measure each page's boilerplate fraction and drop or strip the
worst.  Complements operators/dedup.py (which finds near-duplicate PAIRS;
this finds corpus-wide repeated SPANS regardless of pairing) and the
``max_shingle_df`` stop-shingle knob (same signal, used there only to cap
candidate generation).

Scale shape:
  * shingles travel as md5 hashes (32 bytes regardless of n); per-doc
    shingle sets are distinct (dedup.shingles_col), so document frequency
    is a plain ``count(*)`` per hash — partial aggregation collapses each
    map task's rows before the exchange, no count-distinct state.
  * the boilerplate dictionary (df >= min_docs) is the df-thresholded
    minority of shingles; the per-doc hit count is a hash equi-join
    against it followed by a partial-aggregated groupBy(doc) — both
    shuffle bounded-width rows, never text.
  * output is one row per document (the per-doc signal downstream filters
    on), produced by a left join on the unique doc id; at 100 TB this is
    the standard corpus-sized exchange every per-doc annotation pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.dedup import shingles_from_tokens, tokens_for_shingles


def boilerplate_shingles(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(h, df): md5 hashes of word n-gram shingles appearing in at least
    ``min_docs`` distinct documents, with their document frequency."""
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        tokens_for_shingles(F.col(text_col)).alias("_toks"),
    ).select("id", F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle")
    ).select("id", F.md5("shingle").alias("h"))
    # shingle sets are per-doc distinct -> count(*) IS the doc frequency,
    # and map-side combine applies (no count-distinct state)
    return (
        doc_sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_docs)
    )


def with_boilerplate_frac(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_frac) for EVERY document:
    how much of the doc's distinct n-gram vocabulary is corpus-wide
    boilerplate.  ``boiler_frac`` is rounded to 4dp (oracle stability).

    Shape (r07, closes ADVICE r6): ONE pass over the corpus shingles — a
    LEFT join of the exploded per-doc shingle hashes against the marked
    boilerplate dictionary, collapsed by one partial-aggregated
    groupBy(doc): n_shingles = count(*) (shingles_col yields >= 1 element
    for every document, including empty text), n_boiler = count(marker).
    The previous form computed the shingle array a second time for a
    doc-sized ``sizes`` branch and re-joined it against the hit counts
    (an extra scan + an extra doc-sized shuffle join); the join probe
    volume here is identical to the old inner join's."""
    boiler = boilerplate_shingles(
        docs, n=n, min_docs=min_docs, id_col=id_col, text_col=text_col
    ).select("h", F.lit(1).alias("b"))
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        tokens_for_shingles(F.col(text_col)).alias("_toks"),
    ).select("id", F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle")
    ).select("id", F.md5("shingle").alias("h"))
    return (
        doc_sh.join(boiler, "h", "left")
        .groupBy("id")
        .agg(F.count("*").alias("n_shingles"), F.count("b").alias("n_boiler"))
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_boiler").cast("long").alias("n_boiler"),
            F.round(
                F.col("n_boiler")
                / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
                4,
            ).alias("boiler_frac"),
        )
    )
