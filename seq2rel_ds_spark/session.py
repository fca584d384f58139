"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-first parity runs locally and for scale-out defaults:
AQE on (runtime coalescing + skew-join splitting), Arrow transfers on for the
few vectorized UDFs, UTC session time zone so results are reproducible and
comparable with external oracles (DuckDB), and shuffle partition counts that
callers override per data scale.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "seq2rel-ds-spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cores`` pins an explicit ``local[N]`` master — used by the bench
    harness to measure scaling efficiency at two parallelism levels.  When
    unset, ``SPARK_GRAFT_CPUS`` or ``local[*]`` is used.  On a real cluster
    the master comes from spark-submit and this falls through untouched.
    """
    if cores is not None:
        master = f"local[{cores}]"
    else:
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cpus}]" if env_cpus else "local[*]"

    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # AQE: runtime partition coalescing and skew-join splitting. Explicit
        # salting is still applied on groupBy hot keys (AQE only fixes joins).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the vectorized pandas UDF surface.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep scans splittable at the target scale.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Only force the master when not already running under spark-submit.
    if "SPARK_SUBMIT_MASTER" not in os.environ:
        builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
