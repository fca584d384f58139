"""Eval-set decontamination: flag training documents whose word n-grams
overlap a benchmark/eval corpus.

Training-data-pipeline extension (SURVEY.md §2.10 family) — the reference
pipeline (JohnGiorgi/seq2rel-ds) has no decontamination stage; any
pre-training corpus built at 100 TB must drop documents that leak the
evaluation sets (the standard n-gram-overlap hygiene step: a doc sharing
>= 1 sufficiently-long n-gram with an eval example is contaminated).

Scale shape — the asymmetry IS the design:
  * the eval side is small (10^4-10^6 examples -> at most ~10^7 distinct
    shingle hashes, a few hundred MB) while the doc side is the 100 TB
    corpus, so the eval shingle set BROADCASTS and the doc side is never
    shuffled: explode doc shingles -> broadcast LEFT SEMI-shaped inner
    join -> one partial-aggregated groupBy(doc) whose map-side combine
    reduces each task to its matched docs.
  * shingles travel as md5 hashes, not text — the broadcast table and the
    shuffle rows carry 32-byte keys regardless of n-gram width, and the
    same hash is reproducible by any engine (exact DuckDB oracle).
  * a doc with ZERO overlap never survives the semi join, so the output
    is overlap-sized, not corpus-sized; callers left_anti against it to
    drop contaminated docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.dedup import shingles_from_tokens, tokens_for_shingles


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """One row per CONTAMINATED training doc: (doc_id, n_dirty_shingles,
    n_shingles, dirty_frac) where n_dirty_shingles counts the doc's
    distinct n-gram shingles that appear anywhere in ``eval_docs``.

    ``n`` is the match width: decontamination convention is a largish n
    (8-13 words) so only verbatim leakage matches; the default 3 suits
    small test corpora.  Exactness: shingle sets are per-doc distinct
    (dedup.shingles_col), so counts are set-intersection sizes.
    """
    # n_shingles rides along from F.size BEFORE the explode: a separate
    # per-doc size aggregate would shuffle one row per CORPUS doc (ids are
    # unique, so map-side combine cannot reduce it) — this way the only
    # grouped rows are the semi-join survivors, i.e. O(overlap)
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        tokens_for_shingles(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        shingles_from_tokens(F.col("_toks"), n).alias("sh"),
    ).select(
        "id",
        F.size("sh").alias("n_shingles"),
        F.explode("sh").alias("shingle"),
    ).select("id", "n_shingles", F.md5("shingle").alias("h"))
    eval_sh = (
        eval_docs.select(tokens_for_shingles(F.col(eval_text_col)).alias("_toks"))
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle"))
        .select(F.md5("shingle").alias("h"))
        .distinct()
    )
    dirty = (
        doc_sh.join(F.broadcast(eval_sh), "h", "left_semi")
        # n_shingles is functionally dependent on id — grouping by both
        # keeps it without a second join
        .groupBy("id", "n_shingles")
        .agg(F.count("*").alias("n_dirty_shingles"))
    )
    return dirty.select(
        F.col("id").alias(id_col),
        "n_dirty_shingles",
        "n_shingles",
        F.round(F.col("n_dirty_shingles") / F.col("n_shingles"), 4).alias("dirty_frac"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    max_dirty_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """The filtering form: keep docs whose dirty fraction is <= the
    threshold (0.0 = drop on ANY eval n-gram overlap).  Implemented as a
    left_anti against the overlap-sized contamination table, so the clean
    (vast) majority of the corpus streams through one broadcast-probe +
    anti join and is never shuffled."""
    bad = ngram_contamination(
        docs, eval_docs, n=n, id_col=id_col, text_col=text_col, eval_text_col=eval_text_col
    ).filter(F.col("dirty_frac") > max_dirty_frac).select(id_col)
    return docs.join(bad, id_col, "left_anti")
