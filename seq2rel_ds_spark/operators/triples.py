"""Relation extraction + canonical triple emission (web path).

Stages (north_star wording in parentheses):
  * ``extract_relations`` — pattern-based subject/predicate/object detection
    within sentence windows over linked mentions (the web-scale stand-in for
    the reference's gold relation lines).  Pure Catalyst: a broadcast
    predicate dictionary, window functions for nearest-mention selection.
  * ``canonicalize_triples`` — deterministic entity-ID assignment
    (md5 of the cluster's canonical key), salted two-phase dedup to control
    hub-entity skew, explicit repartition after the dedup stage.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_relations(
    linked_mentions: DataFrame,
    texts: DataFrame,
    predicates: Dict[str, str],
    text_col: str = "text",
) -> DataFrame:
    """(url, sent_idx, subj_uid, pred, obj_uid) from sentence windows.

    A sentence expresses a relation when it contains a predicate cue word;
    the subject is the mention ending closest before the cue, the object the
    mention starting closest after it.  Everything is JVM-side: sentence
    cue positions come from ``instr`` on the sentence slice, nearest
    mentions via two windows.
    """
    # sentence text via document slice: [sent_start, next boundary); we only
    # need the cue position, so instr over the remaining document suffices
    # when bounded by the sentence's mention spans.
    sents = linked_mentions.select("url", "sent_idx", "sent_start").distinct()
    doc = texts.select("url", F.col(text_col).alias("_doc"))

    cue_entries = []
    for word, label in sorted(predicates.items()):
        cue_entries.append(F.struct(F.lit(word).alias("cue"), F.lit(label).alias("pred")))
    cues = F.array(*cue_entries)

    # locate the first cue in each sentence window
    with_doc = sents.join(doc, "url")
    sent_text = F.substring_index(
        F.substring(F.col("_doc"), F.col("sent_start") + 1, 1_000_000), ". ", 1
    )
    located = (
        with_doc.withColumn(
            "hit",
            F.filter(
                F.transform(
                    cues,
                    lambda c: F.struct(
                        (F.instr(sent_text, F.concat(F.lit(" "), c["cue"], F.lit(" ")))).alias(
                            "pos"
                        ),
                        c["pred"].alias("pred"),
                    ),
                ),
                lambda h: h["pos"] > 0,
            ),
        )
        .filter(F.size("hit") > 0)
        .select(
            "url",
            "sent_idx",
            "sent_start",
            (F.get(F.col("hit"), 0)["pos"] + F.col("sent_start")).alias("cue_pos"),
            F.get(F.col("hit"), 0)["pred"].alias("pred"),
        )
    )

    m = linked_mentions.alias("m")
    joined = located.join(m, ["url", "sent_idx"])
    subj_w = Window.partitionBy("url", "sent_idx", "cue_pos").orderBy(F.desc("end"))
    obj_w = Window.partitionBy("url", "sent_idx", "cue_pos").orderBy(F.asc("start"))
    subj = (
        joined.filter(F.col("end") <= F.col("cue_pos"))
        .withColumn("rnk", F.row_number().over(subj_w))
        .filter(F.col("rnk") == 1)
        .select("url", "sent_idx", "cue_pos", "pred", F.col("uid").alias("subj_uid"))
    )
    obj = (
        joined.filter(F.col("start") > F.col("cue_pos"))
        .withColumn("rnk", F.row_number().over(obj_w))
        .filter(F.col("rnk") == 1)
        .select("url", "sent_idx", "cue_pos", F.col("uid").alias("obj_uid"))
    )
    return subj.join(obj, ["url", "sent_idx", "cue_pos"]).select(
        "url", "sent_idx", "subj_uid", "pred", "obj_uid"
    )


def canonicalize_triples(
    relations: DataFrame,
    entity_components: DataFrame = None,
    salt_buckets: int = 64,
    output_partitions: int = None,
) -> DataFrame:
    """(subj, pred, obj, n_support) canonical triple table.

    * optional component mapping folds coreferent uids into one canonical id
      (join with the connected-components output; uid -> component)
    * deterministic entity ids: md5 of the canonical key (stable across
      runs, partitionings and cluster sizes)
    * salted two-phase dedup/aggregation: hub entities (a subj appearing in
      billions of pages) are spread over ``salt_buckets`` partial groups
      before the final merge — the mandated groupBy-skew control
    * explicit repartition after dedup (north_star) sized by the caller
    """
    t = relations
    if entity_components is not None:
        comp = entity_components.select(
            F.col("node").alias("subj_uid"), F.col("component").alias("subj_c")
        )
        t = t.join(F.broadcast(comp), "subj_uid", "left").withColumn(
            "subj_uid", F.coalesce("subj_c", "subj_uid")
        )
        comp_o = entity_components.select(
            F.col("node").alias("obj_uid"), F.col("component").alias("obj_c")
        )
        t = t.join(F.broadcast(comp_o), "obj_uid", "left").withColumn(
            "obj_uid", F.coalesce("obj_c", "obj_uid")
        )

    keyed = t.select(
        F.md5(F.col("subj_uid")).alias("subj"),
        F.col("pred"),
        F.md5(F.col("obj_uid")).alias("obj"),
        F.col("subj_uid").alias("subj_key"),
        F.col("obj_uid").alias("obj_key"),
        "url",
    )
    # two-phase salted aggregation: partial count per (triple, salt) then final
    partial = keyed.groupBy(
        "subj", "pred", "obj", "subj_key", "obj_key",
        F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).alias("_salt"),
    ).agg(F.count("*").alias("cnt"))
    final = partial.groupBy("subj", "pred", "obj", "subj_key", "obj_key").agg(
        F.sum("cnt").alias("n_support")
    )
    if output_partitions:
        final = final.repartition(output_partitions, "subj")
    return final
