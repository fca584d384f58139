"""Sequence packing: assign every document a (bucket, pack) slot in the
concat-then-chunk layout used to build fixed-context pre-training batches.

Training-data-pipeline extension (SURVEY.md §2.10) — the reference
(JohnGiorgi/seq2rel-ds) emits one example per line and leaves batching to
the trainer; a 100 TB corpus is instead packed ahead of time: documents are
concatenated in a deterministic order and cut into ``ctx``-token windows,
so the training job streams dense, shuffle-free batches.  This operator
computes the assignment (which pack a document STARTS in and at what
offset) without materializing the concatenation.

Scale shape:
  * the corpus is first split into ``n_buckets`` md5 hash buckets; each
    bucket is packed independently, so the only shuffle is the window's
    hash partition on ``bucket`` and no global sort ever happens.  At
    100 TB, size ``n_buckets`` so one bucket's rows fit an executor
    (millions of buckets are fine — bucket ids are dense ints).
  * the order within a bucket is md5(salt:doc_id) — deterministic,
    engine-portable (plain string comparison of hex digests), stable
    under re-runs and partition counts, and collision-free in practice,
    so the assignment is reproducible by ANY engine; the DuckDB oracle
    restates it with the same window specification.
  * all arithmetic is integer (token counts, running sums, floor
    division) — no floats anywhere, so cross-engine value equality is
    exact.

Semantics: packs are ``ctx``-token windows of the bucket-local
concatenation.  A document "belongs" to the pack its first token lands in
(``pack_idx``) at offset ``pack_off``; long documents straddle into the
following pack(s) — exactly the GPT-style concat-then-chunk convention,
where window boundaries may split a document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.textstats import tokens_col


def pack_assign(
    docs: DataFrame,
    ctx: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, bucket, n_tokens, start_off, pack_idx, pack_off) — the
    concat-then-chunk pack assignment.

    ``start_off`` is the document's first-token offset in its bucket's
    concatenation; ``pack_idx = start_off // ctx`` and
    ``pack_off = start_off % ctx``.  Global pack identity is the pair
    (bucket, pack_idx).
    """
    if ctx <= 0:
        raise ValueError(f"ctx must be positive, got {ctx}")
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    # first 4 hex digits -> 0..65535, folded onto n_buckets
    bucket = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("int"), F.lit(n_buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer floor division (start_off >= 0, ctx > 0): Spark's `div` is
    # exact on longs at any magnitude (no double round-trip)
    return (
        docs.select(
            F.col(id_col),
            bucket.alias("bucket"),
            h.alias("sort_key"),
            F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            id_col,
            "bucket",
            "n_tokens",
            "start_off",
            F.expr(f"start_off DIV {int(ctx)}").alias("pack_idx"),
            F.pmod("start_off", F.lit(ctx)).alias("pack_off"),
        )
    )
