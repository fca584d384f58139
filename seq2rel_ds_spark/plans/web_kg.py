"""The flagship web-scale KG-construction pipeline (north_rule).

    pages -> extract -> mentions -> linked -> coref components -> triples

Every stage is a checkpointed Pipeline stage (resumable, lineage rows);
stage-level operators are documented in their modules.  The pipeline is a
pure function of the pages table: rerunning any suffix reproduces identical
bytes (deterministic generation, md5 entity ids, salted but order-free
aggregation).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.cluster import connected_components
from seq2rel_ds_spark.operators.extract import extract_stage
from seq2rel_ds_spark.operators.mention import (
    cue_rows,
    link_mentions,
    mention_rows,
    scan_sentences,
)
from seq2rel_ds_spark.operators.triples import canonicalize_triples, extract_relations
from seq2rel_ds_spark.plans.pipeline import Pipeline
from seq2rel_ds_spark.sources import pages as pages_src


def coref_edges(linked: DataFrame) -> DataFrame:
    """Mention-pair edge DataFrame for the coreference CC job: chain edges
    between consecutive mentions of the same (url, uid).  Node key =
    md5(url:start:end) — balanced, deterministic, partition-independent."""
    node = F.md5(F.concat_ws(":", "url", "start", "end"))
    from pyspark.sql import Window

    w = Window.partitionBy("url", "uid").orderBy("start", "end")
    with_prev = linked.withColumn("node", node).withColumn(
        "prev", F.lag("node").over(w)
    )
    return with_prev.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("src"), F.col("node").alias("dst")
    )


def run_web_kg(
    spark: SparkSession,
    n_docs: int,
    workdir: str,
    partitions: int = 32,
    pages_df: Optional[DataFrame] = None,
    use_cc: bool = True,
) -> DataFrame:
    """Run the full pipeline over a (synthesized or provided) pages table;
    returns the canonical triple DataFrame (also materialized under
    ``workdir/stage=triples``)."""
    pipe = Pipeline(spark, workdir, run_fingerprint=f"n={n_docs}/p={partitions}")
    dictionary = pages_src.dictionary_df(spark)
    surfaces = [r["surface"] for r in dictionary.collect()]

    pages = pipe.stage(
        "pages",
        lambda _: pages_df
        if pages_df is not None
        else pages_src.synthesize_pages(spark, n_docs, partitions),
    )
    texts = pipe.stage("extract", lambda o: extract_stage(o["pages"]))
    # one Arrow pass emits mention AND predicate-cue rows; the stage
    # materializes both so neither downstream branch rescans text
    scans = pipe.stage(
        "scan", lambda o: scan_sentences(o["extract"], surfaces, pages_src.PREDICATES)
    )
    linked = pipe.stage(
        "linked",
        # explicit repartition after the skew-heavy link stage (north_star)
        lambda o: link_mentions(mention_rows(o["scan"]), dictionary).repartition(
            partitions, "url"
        ),
    )
    if use_cc:
        components = pipe.stage(
            "components", lambda o: connected_components(coref_edges(o["linked"]))
        )
    relations = pipe.stage(
        "relations",
        lambda o: extract_relations(o["linked"], cue_rows(o["scan"])),
    )
    triples = pipe.stage(
        "triples",
        lambda o: canonicalize_triples(
            o["relations"], salt_buckets=64, output_partitions=partitions
        ),
    )
    return triples


def triple_prf(triples: DataFrame, gold: DataFrame) -> dict:
    """Set precision/recall/F1 of (subj_key, pred, obj_key) vs gold
    (subj, pred, obj) — the north-rule acceptance metric."""
    mine = triples.select(
        F.col("subj_key").alias("subj"), "pred", F.col("obj_key").alias("obj")
    ).distinct()
    g = gold.select("subj", "pred", "obj").distinct()
    tp = mine.join(g, ["subj", "pred", "obj"], "inner").count()
    n_mine = mine.count()
    n_gold = g.count()
    p = tp / n_mine if n_mine else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "mine": n_mine, "gold": n_gold}
