"""Structured Streaming ingestion: a stream of crawled pages -> incremental
mention rows and windowed crawl metrics.

The reference is batch-only; this is the engine's incremental path for a
continuously-arriving crawl (new WARC drops landing as parquet files).  The
same batch operators run unchanged inside ``foreachBatch`` / direct stream
transforms because they are narrow (mapInPandas) or stream-safe
(windowed aggregation with watermarks).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.extract import _extract_batches
from seq2rel_ds_spark.operators.mention import detect_mentions
from seq2rel_ds_spark.sources.pages import _PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream over a directory of parquet page drops."""
    return (
        spark.readStream.schema(_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_mentions(pages_stream: DataFrame, surfaces: List[str]) -> DataFrame:
    """Incremental extract->detect over the page stream (stateless — both
    stages are narrow, so they stream trivially)."""
    texts = pages_stream.select("url", "warc_ts", "lang", "html").mapInPandas(
        _extract_batches, schema="url string, warc_ts timestamp, lang string, text string"
    )
    return detect_mentions(texts, surfaces)


def streaming_crawl_metrics(pages_stream: DataFrame) -> DataFrame:
    """Windowed crawl-rate metrics with a watermark for late pages:
    pages and bytes per 10-minute window per language."""
    return (
        pages_stream.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_chars",
        )
    )
