"""GDA-corpus source (gene-disease associations).

Reference behavior (/root/reference/seq2rel_ds/gda.py:40-85): three files per
split — blank-line-separated ``abstracts.txt`` blocks (``pmid\\ntitle[\\nabstract]``),
blank-line-separated ``anns.txt`` blocks of PubTator mention lines, and a
``labels.csv`` (header ``pmid,geneId,diseaseId,label``) whose rows become
relation lines ``pmid\\tGDA\\tgeneId\\tdiseaseId``.

Spark-first mapping: the reference stitches these into one giant PubTator
string and re-parses it; we skip the round trip entirely — three scans, two
broadcast-able inner equi-joins on ``pmid`` (docs without labels error in the
reference via ``parsed_labels[pmid]``, i.e. inner-join semantics), emitting
the engine's document DataFrame directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seq2rel_ds_spark.functions.exprs import normalize_ws_col

REL_LABEL = "GDA"


def _abstract_blocks(blocks: DataFrame) -> DataFrame:
    """(pmid, title, abstract) from ``pmid\\ntitle[\\nabstract]`` blocks
    (gda.py:40-50); title/abstract whitespace-normalized like the reference."""
    lines = F.split(F.trim("value"), "\n")
    return blocks.select(
        F.trim(F.get(lines, 0)).alias("pmid"),
        normalize_ws_col(F.coalesce(F.get(lines, 1), F.lit(""))).alias("title"),
        # the reference's exact-3-line contract (gda.py:46): malformed >3-line
        # blocks get abstract='' rather than silently adopting line 3
        F.when(F.size(lines) == 3, normalize_ws_col(F.get(lines, 2)))
        .otherwise(F.lit(""))
        .alias("abstract"),
    )


def _ann_blocks(blocks: DataFrame) -> DataFrame:
    """(pmid, mention_lines array) from anns.txt blocks; pmid comes from the
    first column of the first line (gda.py:72)."""
    lines = F.filter(F.split(F.trim("value"), "\n"), lambda ln: F.trim(ln) != "")
    return blocks.select(
        F.trim(F.get(F.split(F.get(lines, 0), "\t"), 0)).alias("pmid"),
        F.transform(lines, lambda ln: F.trim(ln)).alias("mention_lines"),
    )


def _label_lines(labels_csv: DataFrame) -> DataFrame:
    """(pmid, relation_lines array) from the labels CSV (gda.py:53-63).

    CSV row order is preserved per pmid via the file-order surrogate
    ``monotonically_increasing_id`` (single-file reads keep split order);
    relation insertion order is the reference's final sort tie-break.
    """
    rows = (
        labels_csv.withColumn("_ord", F.monotonically_increasing_id())
        .select(
            F.trim("pmid").alias("pmid"),
            F.concat_ws(
                "\t", F.trim("pmid"), F.lit(REL_LABEL), F.trim("geneId"), F.trim("diseaseId")
            ).alias("rel_line"),
            "_ord",
        )
    )
    return rows.groupBy("pmid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_ord", "rel_line"))), lambda s: s["rel_line"]
        ).alias("relation_lines")
    )


def read_gda(
    spark: SparkSession, abstracts_path: str, anns_path: str, labels_path: str
) -> DataFrame:
    """Assemble the document DataFrame for one GDA split."""
    abstracts = _abstract_blocks(spark.read.text(abstracts_path, lineSep="\n\n"))
    anns = _ann_blocks(spark.read.text(anns_path, lineSep="\n\n"))
    labels = _label_lines(
        spark.read.csv(labels_path, header=True).toDF("pmid", "geneId", "diseaseId", "label")
    )
    return assemble_gda(abstracts, anns, labels)


def gda_from_strings(
    spark: SparkSession, abstracts: str, anns: str, labels: str
) -> DataFrame:
    """Testing convenience mirroring read_gda for in-memory strings."""
    abs_df = _abstract_blocks(
        spark.createDataFrame([(b,) for b in abstracts.strip().split("\n\n")], "value string")
    )
    anns_df = _ann_blocks(
        spark.createDataFrame([(b,) for b in anns.strip().split("\n\n")], "value string")
    )
    label_rows = [ln.split(",") for ln in labels.strip().split("\n")[1:]]
    labels_df = _label_lines(
        spark.createDataFrame(label_rows, "pmid string, geneId string, diseaseId string, label string")
    )
    return assemble_gda(abs_df, anns_df, labels_df)


def assemble_gda(abstracts: DataFrame, anns: DataFrame, labels: DataFrame) -> DataFrame:
    """anns ⋈ abstracts ⋈ labels on pmid (inner), document rows out.

    The ann blocks drive the output (gda.py:71): only annotated pmids emit a
    document.  Both dimension-side joins broadcast when small.
    """
    joined = (
        anns.join(abstracts, "pmid", "inner")
        .join(labels, "pmid", "inner")
    )
    return joined.select(
        F.col("pmid").alias("doc_id"),
        "title",
        "abstract",
        F.concat("mention_lines", "relation_lines").alias("ann_lines"),
    )
