"""DGM-corpus source (drug-gene-mutation JSONL, 3-ary relations).

Reference behavior (/root/reference/seq2rel_ds/dgm.py:15-65,135-147): JSONL
examples with tokenized ``paragraphs``, parallel token-span ``mentions``
(name doubles as uid), and ``triple_candidates`` (label 0 dropped; empty
candidate lists drop the whole example).  Token spans are converted to char
offsets by finding ALL overlapping occurrences of the joined mention text in
the sanitized abstract — one mention line per occurrence.

Spark-first mapping: JSONL is Spark's native JSON mode; candidate/example
filters and relation lines are Catalyst; the token->char alignment is the one
genuinely Python step (overlapping ``findall`` has no Catalyst equivalent) and
runs as a single Arrow-batched ``mapInPandas`` pass that also forms the plan
barrier ahead of parse_documents' lambda pipeline.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from seq2rel_ds_spark.functions.exprs import normalize_ws_col

REL_LABEL = "DGM"

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("title", StringType()),
        StructField("abstract", StringType()),
        StructField("ann_lines", ArrayType(StringType())),
    ]
)


def _align_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Token-span -> char-span alignment (dgm.py:39-48): every overlapping
    occurrence of each mention text in the abstract emits one mention line."""
    from seq2rel_ds_spark.core.text import overlapping_positions

    for pdf in batches:
        ann_lines_col: List[List[str]] = []
        for pmid, abstract, mention_texts, rel_lines in zip(
            pdf["doc_id"], pdf["abstract"], pdf["mention_structs"], pdf["relation_lines"]
        ):
            lines: List[str] = []
            for m in mention_texts:
                text = m["text"]
                for start in overlapping_positions(abstract, text):
                    end = start + len(text)
                    lines.append(
                        f"{pmid}\t{start}\t{end}\t{text}\t{m['type']}\t{m['name']}"
                    )
            lines.extend(rel_lines)
            ann_lines_col.append(lines)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "title": [""] * len(pdf),
                "abstract": pdf["abstract"],
                "ann_lines": ann_lines_col,
            }
        )


def read_dgm(spark: SparkSession, path: str) -> DataFrame:
    """Read DGM JSONL into the document DataFrame."""
    return dgm_documents(spark.read.json(path))


def dgm_documents(examples: DataFrame) -> DataFrame:
    """Normalize DGM examples to (doc_id, title, abstract, ann_lines)."""
    # Examples without triple candidates are dropped (dgm.py:135-137).
    df = examples.filter(F.size("triple_candidates") > 0)

    abstract = normalize_ws_col(
        F.array_join(F.transform("paragraphs", lambda p: F.array_join(p, " ")), " ")
    )
    df = df.withColumn("abstract", abstract)

    # Mention text = sanitize(" ".join(paragraph[start:end])) — dgm.py:39-40.
    mention_structs = F.flatten(
        F.transform(
            F.arrays_zip(F.col("paragraphs").alias("para"), F.col("mentions").alias("ms")),
            lambda z: F.transform(
                z["ms"],
                lambda m: F.struct(
                    normalize_ws_col(
                        F.array_join(
                            F.slice(
                                z["para"],
                                (m["start"] + 1).cast("int"),
                                (m["end"] - m["start"]).cast("int"),
                            ),
                            " ",
                        )
                    ).alias("text"),
                    m["type"].alias("type"),
                    m["name"].alias("name"),
                ),
            ),
        )
    )

    # Relation lines from candidates with label != 0 (dgm.py:52-58).
    relation_lines = F.transform(
        F.filter("triple_candidates", lambda c: c["label"] != 0),
        lambda c: F.concat_ws(
            "\t", F.col("pmid"), F.lit(REL_LABEL), c["drug"], c["gene"], c["variant"]
        ),
    )

    staged = df.select(
        F.col("pmid").alias("doc_id"),
        "abstract",
        mention_structs.alias("mention_structs"),
        relation_lines.alias("relation_lines"),
    )
    return staged.mapInPandas(_align_batches, schema=_DOC_SCHEMA)


def filter_by_pmids(docs: DataFrame, pmids: DataFrame) -> DataFrame:
    """Split-membership filter (dgm.py:146-147) as a broadcast semi-join on
    doc_id (the reference does an O(n) list scan per example)."""
    return docs.join(F.broadcast(pmids.select(F.col(pmids.columns[0]).alias("doc_id"))), "doc_id", "left_semi")
