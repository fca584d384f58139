"""MeSH tree dimension source.

Reference behavior (cdr.py:27-35): a TSV of ``tree_numbers \\t mesh_uid \\t
name`` with one header line, folded into a uid -> [tree_numbers] multimap and
memoized.  Engine mapping: a small dimension DataFrame ``(uid, tree)`` that
joins broadcast (the lru_cache equivalent is broadcast-once)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mesh_tree(spark: SparkSession, path: str) -> DataFrame:
    """TSV -> (uid, tree) rows; the header line is consumed as CSV header
    (whatever its labels) and columns are taken positionally."""
    raw = spark.read.option("sep", "\t").option("header", True).csv(path)
    cols = raw.columns
    return (
        raw.select(
            F.trim(F.col(cols[1])).alias("uid"), F.trim(F.col(cols[0])).alias("tree")
        )
        .filter(F.col("uid").isNotNull() & (F.col("uid") != ""))
    )


def mesh_from_mapping(spark: SparkSession, mapping: dict) -> DataFrame:
    """Testing convenience: {uid: [tree, ...]} -> (uid, tree) rows."""
    rows = [(uid, t) for uid, trees in mapping.items() for t in trees]
    return spark.createDataFrame(rows, "uid string, tree string")
