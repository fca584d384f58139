"""Hypernym negative-relation filter (CDR semantics) as DataFrame joins.

Parity target: /root/reference/seq2rel_ds/cdr.py:47-93.  Per document, the
negative candidate set is (chemicals x diseases) minus the positives; a
negative is flagged when it shares its chemical with some positive AND one of
its disease's MeSH tree numbers is a substring of one of that positive's
disease tree numbers (ancestor test).

Spark plan (all joins doc-bounded or broadcast):
  positives   = explode(relations)                                (narrow)
  candidates  = chems ⋈ disos on doc_id (doc-local cross product) (shuffle 1)
                left_anti positives                               (AQE-coalesced)
  theta check = candidates ⋈ broadcast(mesh trees) x2 on disease uid,
                ⋈ positives on (doc_id, chem),
                filter exists-substring (instr θ predicate)
  result      = first-occurrence-free deterministic (chem, diso) order,
                grouped back onto the document rows (left join; [] default)

The reference's output order for filtered relations is hash-set iteration
order (nondeterministic across processes, cdr.py:79); ours is the sorted
(chem, diso) order — parity tests compare as sets, exactly like the
reference's own pytest does for multi-element cases.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_schema_labels(parsed: DataFrame) -> Tuple[str, str, str]:
    """(head entity label, tail entity label, relation label) from the first
    document carrying relations (cdr.py:55-61) — order-stable via doc_id."""
    row = (
        parsed.filter(F.size("relations") > 0)
        .orderBy("doc_id")
        .select(
            F.get(F.col("relations"), 0).alias("rel"),
            F.map_from_entries(
                F.transform("clusters", lambda c: F.struct(c["uid"], c["label"]))
            ).alias("labels_by_uid"),
        )
        .select(
            F.element_at("labels_by_uid", F.get(F.col("rel.uids"), 0)).alias("head_label"),
            F.element_at("labels_by_uid", F.get(F.col("rel.uids"), 1)).alias("tail_label"),
            F.col("rel.label").alias("rel_label"),
        )
        .first()
    )
    if row is None:
        raise ValueError("no document with relations; cannot infer labels")
    return row["head_label"], row["tail_label"], row["rel_label"]


def mesh_trees(mesh: DataFrame) -> DataFrame:
    """uid -> collected tree numbers (cdr.py:27-35's defaultdict multimap)."""
    return mesh.groupBy("uid").agg(F.collect_list("tree").alias("trees"))


def filter_hypernyms(
    parsed: DataFrame,
    mesh: DataFrame,
    labels: Optional[Tuple[str, str, str]] = None,
) -> DataFrame:
    """Returns ``parsed`` plus a ``filtered_relations`` column (same struct
    shape as ``relations``), empty array where nothing is flagged."""
    chem_label, diso_label, rel_label = labels or infer_schema_labels(parsed)
    trees = F.broadcast(mesh_trees(mesh))

    ents = parsed.select(
        "doc_id", F.explode("clusters").alias("c")
    ).select("doc_id", F.col("c.uid").alias("uid"), F.col("c.label").alias("label"))
    chems = ents.filter(F.col("label") == chem_label).select("doc_id", F.col("uid").alias("chem"))
    disos = ents.filter(F.col("label") == diso_label).select("doc_id", F.col("uid").alias("diso"))

    pos = parsed.select("doc_id", F.explode("relations").alias("r")).select(
        "doc_id",
        F.get(F.col("r.uids"), 0).alias("chem"),
        F.get(F.col("r.uids"), 1).alias("diso"),
    )

    # Doc-local cross product minus positives (cdr.py:70-79).
    neg = chems.join(disos, "doc_id").join(pos, ["doc_id", "chem", "diso"], "left_anti")

    pos_trees = pos.join(trees, pos["diso"] == trees["uid"], "inner").select(
        "doc_id", "chem", F.col("trees").alias("pos_trees")
    )
    neg_trees = neg.join(trees, neg["diso"] == trees["uid"], "inner").select(
        "doc_id", "chem", "diso", F.col("trees").alias("neg_trees")
    )

    # θ predicate: some neg tree number is a substring of some pos tree
    # number for the same (doc, chem) (cdr.py:83-90).
    flagged = (
        neg_trees.join(pos_trees, ["doc_id", "chem"])
        .filter(
            F.exists(
                "neg_trees",
                lambda nt: F.exists("pos_trees", lambda pt: F.instr(pt, nt) > 0),
            )
        )
        .select("doc_id", "chem", "diso")
        .dropDuplicates(["doc_id", "chem", "diso"])
    )

    per_doc = flagged.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("chem", "diso"))),
            lambda s: F.struct(
                F.array(s["chem"], s["diso"]).alias("uids"),
                F.lit(rel_label).alias("label"),
            ),
        ).alias("filtered_relations")
    )

    empty = F.expr("array()").cast(
        "array<struct<uids:array<string>,label:string>>"
    )
    return parsed.join(per_doc, "doc_id", "left").withColumn(
        "filtered_relations", F.coalesce("filtered_relations", empty)
    )
