"""Data-mixture shaping: deterministic per-group token-budget caps.

Training-data-pipeline extension (SURVEY.md §2.10) — a pre-training
mixture assigns each source/domain a token budget (cap an over-crawled
domain, hit a target mixture ratio).  This operator decides, per
document, whether it fits its group's budget: documents stream in a
deterministic md5 order within the group and are kept while the group's
running token total stays within budget (once the prefix exceeds the
budget the rest of the group's stream is dropped — the truncate-the-
stream convention, monotone and exactly reproducible).

Relation to neighbors: ``split.stratified_sample`` keeps a RATE per
stratum (every row an independent draw, output size proportional);
this cap keeps a TOKEN QUOTA per group (output bounded in absolute
tokens regardless of group size) — mixtures need both.

Scale shape: one hash shuffle on the group key and a running-sum window
within it — identical shape to operators/pack.py (group budgets are
dimension-sized: a literal map compiled into the plan).  A single group
is ordered within one task; groups ARE the parallelism unit, so a
mixture with very few giant groups should sub-bucket first (pack.py's
bucketing applies verbatim).  All arithmetic is int64; the md5 order is
engine-portable, so the oracle restates the identical window.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.textstats import tokens_col


def cap_tokens_per_group(
    docs: DataFrame,
    group_col: str,
    max_tokens: int,
    budgets: Optional[Dict[str, int]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "cap",
) -> DataFrame:
    """(id, group, n_tokens, cum_tokens, kept): ``kept = 1`` iff the
    group's running total INCLUDING this document stays within its
    budget.  ``budgets`` overrides ``max_tokens`` per group value."""
    if max_tokens < 0:
        raise ValueError(f"max_tokens must be >= 0, got {max_tokens}")
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(group_col)
        .orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if budgets:
        mapping = F.create_map(
            *[lit for g, b in budgets.items() for lit in (F.lit(g), F.lit(int(b)))]
        )
        budget = F.coalesce(mapping[F.col(group_col)], F.lit(int(max_tokens)))
    else:
        budget = F.lit(int(max_tokens))
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            h.alias("sort_key"),
            F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            group_col,
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= budget).cast("int").alias("kept"),
        )
    )
