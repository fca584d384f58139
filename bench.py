"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then the flagship web-KG
pipeline at two parallelism levels (local[N] and local[4N]) on the SAME
synthesized pages input — the sandbox proxy for N vs 4N executors mandated
by BASELINE.json — and prints ONE JSON line:

    {"metric": "...", "value": <triples/sec @4N>, "unit": "triples/sec",
     "queries": {...per-query seconds...}, "sf": ...,
     "kg_scaling": {"n_docs":..., "cores_low":8, "cores_high":32,
                    "throughput_low":..., "throughput_high":...,
                    "scaling_efficiency":...},
     "elapsed_sec": ...}

The scaling run uses the fused in-memory pipeline (no stage parquet writes)
so it measures compute throughput, not local-disk bandwidth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "events_hourly",
    "events_sessions",
    "doc_token_stats",
    "token_histogram",
    "exact_dedup",
    "minhash_lsh",
    "ann_topk",
    "kg_triples",
]


def _fresh_spark(cores: int, shuffle_partitions: int) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # a new master requires a fresh JVM context; SparkSession.stop() +
    # builder with new master handles that in local mode
    from seq2rel_ds_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local[{cores}]", cores=cores, shuffle_partitions=shuffle_partitions
    )


def run_queries(spark: SparkSession, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    return timings


def run_kg_fused(spark: SparkSession, n_docs: int, partitions: int) -> tuple:
    """Fused in-memory flagship pipeline; returns (n_triples, seconds)."""
    from seq2rel_ds_spark.operators.extract import extract_stage
    from seq2rel_ds_spark.operators.mention import detect_mentions, link_mentions
    from seq2rel_ds_spark.operators.triples import canonicalize_triples, extract_relations
    from seq2rel_ds_spark.sources import pages as pages_src

    dictionary = pages_src.dictionary_df(spark)
    surfaces = [r["surface"] for r in dictionary.collect()]
    t0 = time.time()
    pages = pages_src.synthesize_pages(spark, n_docs, partitions=partitions)
    texts = extract_stage(pages)
    mentions = detect_mentions(texts, surfaces)
    linked = link_mentions(mentions, dictionary, texts)
    relations = extract_relations(linked, texts, pages_src.PREDICATES)
    triples = canonicalize_triples(relations, salt_buckets=64)
    n = triples.count()
    return n, time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "20000"))
    cores_low = max(cpus // 4, 1)
    t_start = time.time()

    # headline queries at full parallelism
    spark = _fresh_spark(cpus, shuffle_partitions=2 * cpus)
    timings = run_queries(spark, sf_dir)

    # flagship KG pipeline at 4N cores (same session)
    n_hi, sec_hi = run_kg_fused(spark, kg_docs, partitions=2 * cpus)
    thr_hi = n_hi / sec_hi if sec_hi else 0.0

    # same input at N cores
    spark = _fresh_spark(cores_low, shuffle_partitions=2 * cores_low)
    n_lo, sec_lo = run_kg_fused(spark, kg_docs, partitions=2 * cores_low)
    thr_lo = n_lo / sec_lo if sec_lo else 0.0
    spark.stop()

    eff = (thr_hi / thr_lo) / (cpus / cores_low) if thr_lo else 0.0
    result = {
        "metric": "kg_triples_per_sec@local[%d]" % cpus,
        "value": round(thr_hi, 2),
        "unit": "triples/sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "kg_scaling": {
            "n_docs": kg_docs,
            "n_triples": n_hi,
            "cores_low": cores_low,
            "cores_high": cpus,
            "seconds_low": round(sec_lo, 3),
            "seconds_high": round(sec_hi, 3),
            "throughput_low": round(thr_lo, 2),
            "throughput_high": round(thr_hi, 2),
            "scaling_efficiency": round(eff, 3),
        },
        "elapsed_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
