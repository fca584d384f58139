"""PubTator text-corpus source.

Reference behavior (util.py:134-148): a corpus is a plain-text string with
blank-line-separated document blocks; block line 1 is ``pmid|t|title``,
line 2 is ``pmid|a|abstract``, remaining lines are tab-delimited mention or
relation annotations.

Spark-first mapping: ``spark.read.text(path, lineSep="\\n\\n")`` yields one
row per document block — an embarrassingly parallel, splittable scan — and
everything after that is JVM-side string expressions.  No shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLUMNS = ("doc_id", "title", "abstract", "ann_lines")


def read_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Read a PubTator corpus file into the document DataFrame."""
    blocks = spark.read.text(path, lineSep="\n\n")
    return docs_from_blocks(blocks)


def docs_from_strings(spark: SparkSession, corpus: str) -> DataFrame:
    """Testing/driver convenience: parse an in-memory corpus string."""
    blocks = [(b,) for b in corpus.strip().split("\n\n")]
    return docs_from_blocks(spark.createDataFrame(blocks, "value string"))


def docs_from_blocks(blocks: DataFrame) -> DataFrame:
    """Normalize raw blocks (column ``value``) to (doc_id, title, abstract,
    ann_lines).  Mirrors util.py:140-145: title line split on ``|t|``,
    abstract on ``|a|`` keeping the last segment, both trimmed."""
    lines = F.split(F.trim(F.col("value")), "\n")
    title_line = F.get(lines, 0)
    abstract_line = F.get(lines, 1)
    return blocks.select(
        F.get(F.split(title_line, r"\|t\|", 2), 0).alias("doc_id"),
        F.trim(F.get(F.split(title_line, r"\|t\|", 2), 1)).alias("title"),
        # unlimited split + last element == the reference's split('|a|')[-1]
        # (an abstract containing a literal '|a|' keeps only the last segment)
        F.trim(F.element_at(F.split(abstract_line, r"\|a\|", -1), -1)).alias("abstract"),
        F.filter(
            F.slice(lines, 3, F.greatest(F.size(lines) - 2, F.lit(0))),
            lambda ln: F.trim(ln) != "",
        ).alias("ann_lines"),
    )
