"""DocRED-joint source.

Reference behavior (/root/reference/seq2rel_ds/docred.py:34-68): each JSON
example carries tokenized sentences (``sents``), a ``vertexSet`` (one entry
per coref cluster, mentions with per-sentence token spans) and optional
``labels`` ({r, h, t} indexing vertexSet).  The reference renders these into
PubTator text (empty title; per-sentence token spans lifted to document-level
token offsets by prefix sums; relation ids mapped to verbose names) and
re-parses.

Spark-first mapping: no text round trip — everything is higher-order array
expressions over the parsed JSON (prefix sums via ``aggregate`` over sentence
slices), emitting the engine's document DataFrame directly.  Offsets are
token indices, not characters: harmless, they are only ever used as ordering
keys (and DocRED has no compound mentions, so re-anchoring never fires).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from seq2rel_ds_spark.functions.exprs import normalize_ws_col


def verbose_label_expr(raw: Column) -> Column:
    """``"_".join(verbose.strip().replace(",", "").upper().split())``
    (docred.py:62) as a Catalyst expression over the verbose name."""
    cleaned = F.upper(F.translate(F.trim(raw), ",", ""))
    return F.regexp_replace(cleaned, r"\s+", "_")


def read_docred(
    spark: SparkSession, path: str, rel_labels: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Read a DocRED-joint JSON array file into the document DataFrame.

    ``rel_labels`` maps relation ids to verbose names (types.json
    ``relations.*.verbose`` — docred.py:101).
    """
    examples = spark.read.json(path, multiLine=True)
    return docred_documents(examples, rel_labels)


def docred_documents(
    examples: DataFrame, rel_labels: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Normalize DocRED examples to (doc_id, title, abstract, ann_lines).

    doc_id is the example's position in the file (docred.py:38) — a
    file-order surrogate id; it never appears in output text.
    """
    df = examples.withColumn("doc_id", F.monotonically_increasing_id().cast("string"))

    # text = sanitize(" ".join(" ".join(sent) for sent in sents)) — docred.py:40
    text = normalize_ws_col(
        F.array_join(F.transform("sents", lambda s: F.array_join(s, " ")), " ")
    )
    df = df.withColumn("abstract", text).withColumn("title", F.lit(""))

    # Document-level token offsets: start/end + sum(len(s) for s in sents[:sent_id])
    # (docred.py:49-51) — a prefix sum via aggregate over a sentence slice.
    def sent_offset(sent_id: Column) -> Column:
        return F.aggregate(
            F.slice(F.col("sents"), 1, sent_id),
            F.lit(0),
            lambda acc, s: acc + F.size(s),
        )

    mention_lines = F.flatten(
        F.transform(
            F.col("vertexSet"),
            lambda vertex, ent_id: F.transform(
                vertex,
                lambda m: F.concat_ws(
                    "\t",
                    F.col("doc_id"),
                    (F.get(m["pos"], 0) + sent_offset(m["sent_id"])).cast("string"),
                    (F.get(m["pos"], 1) + sent_offset(m["sent_id"])).cast("string"),
                    normalize_ws_col(m["name"]),
                    m["type"],
                    ent_id.cast("string"),
                ),
            ),
        )
    )

    if rel_labels:
        label_map = F.create_map(
            *[x for k, v in sorted(rel_labels.items()) for x in (F.lit(k), F.lit(v))]
        )

        def rel_label(r):
            # parity with the reference (docred.py:62): an id missing from
            # types.json raises instead of silently emitting raw ids
            mapped = F.element_at(label_map, r["r"])
            return verbose_label_expr(
                F.when(mapped.isNotNull(), mapped).otherwise(
                    F.raise_error(
                        F.concat(F.lit("unmapped DocRED relation id: "), r["r"])
                    )
                )
            )
    else:
        rel_label = lambda r: r["r"]  # noqa: E731

    labels_col = (
        F.col("labels")
        if "labels" in examples.columns
        else F.lit(None).cast("array<struct<h:long,r:string,t:long>>")
    )
    relation_lines = F.transform(
        F.coalesce(labels_col, F.expr("array()").cast("array<struct<h:long,r:string,t:long>>")),
        lambda r: F.concat_ws(
            "\t",
            F.col("doc_id"),
            rel_label(r),
            r["h"].cast("string"),
            r["t"].cast("string"),
        ),
    )

    return df.select(
        "doc_id",
        "title",
        "abstract",
        F.concat(mention_lines, relation_lines).alias("ann_lines"),
    )
