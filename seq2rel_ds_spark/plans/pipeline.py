"""Checkpointed stage runner with per-partition lineage + metrics.

North-rule requirements implemented here:
  * every stage materializes to a parquet directory (Iceberg-table layout;
    the engine is catalog-agnostic — swap ``_write``/``_read`` for
    ``writeTo(...).using("iceberg")`` when an Iceberg catalog is configured)
  * a stage commits atomically: data files + ``_manifest.json`` (row count,
    partition count, input fingerprint, wall time); Spark's ``_SUCCESS``
    marker guards partial writes
  * resume is idempotent: a completed stage (manifest + _SUCCESS present and
    fingerprint matching) is skipped and its output re-read — kill the job
    between any two stages and rerun; bytes out are identical
  * per-partition lineage rows (stage, partition id, row count) are appended
    to ``<root>/_lineage`` in the same run
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    skipped: bool
    rows: int
    partitions: int
    seconds: float
    path: str


class Pipeline:
    """A linear DAG of named stages, each fn: dict[str, DataFrame] -> DataFrame."""

    def __init__(self, spark: SparkSession, root: str, run_fingerprint: str = ""):
        self.spark = spark
        self.root = Path(root)
        self.fingerprint = run_fingerprint
        self.results: List[StageResult] = []
        self._outputs: Dict[str, DataFrame] = {}

    # -- storage ------------------------------------------------------------

    def _stage_dir(self, name: str) -> Path:
        return self.root / f"stage={name}"

    def _manifest_path(self, name: str) -> Path:
        return self._stage_dir(name) / "_manifest.json"

    def _is_complete(self, name: str) -> bool:
        man = self._manifest_path(name)
        success = self._stage_dir(name) / "_SUCCESS"
        if not (man.exists() and success.exists()):
            return False
        try:
            meta = json.loads(man.read_text())
        except (OSError, json.JSONDecodeError):
            return False
        return meta.get("fingerprint") == self.fingerprint

    def _write(self, name: str, df: DataFrame) -> StageResult:
        t0 = time.time()
        path = str(self._stage_dir(name))
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage: (stage, partition, rows) — computed from the
        # materialized files so it reflects what was actually committed.  The
        # total row count is folded out of the same aggregate (one data scan;
        # the lineage rows themselves are tiny — one per partition — so they
        # are collected and re-written without touching the data again).
        lineage_rows = (
            out.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        rows = sum(r["rows"] for r in lineage_rows)
        lineage = self.spark.createDataFrame(
            [(name, r["_p"], r["rows"]) for r in lineage_rows],
            "stage string, partition int, rows long",
        )
        lineage.write.mode("append").parquet(str(self.root / "_lineage"))
        parts = out.rdd.getNumPartitions()
        seconds = time.time() - t0
        self._manifest_path(name).write_text(
            json.dumps(
                {
                    "stage": name,
                    "rows": rows,
                    "partitions": parts,
                    "seconds": round(seconds, 3),
                    "fingerprint": self.fingerprint,
                    "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                }
            )
        )
        return StageResult(name, False, rows, parts, seconds, path)

    # -- execution ------------------------------------------------------------

    def stage(
        self,
        name: str,
        fn: Callable[[Dict[str, DataFrame]], DataFrame],
        force: bool = False,
    ) -> DataFrame:
        """Run (or resume) one stage; returns its materialized DataFrame."""
        if not force and self._is_complete(name):
            df = self.spark.read.parquet(str(self._stage_dir(name)))
            man = json.loads(self._manifest_path(name).read_text())
            self.results.append(
                StageResult(name, True, man["rows"], man["partitions"], 0.0, str(self._stage_dir(name)))
            )
            self._outputs[name] = df
            return df
        df = fn(self._outputs)
        res = self._write(name, df)
        self.results.append(res)
        out = self.spark.read.parquet(res.path)
        self._outputs[name] = out
        return out

    def metrics(self) -> List[dict]:
        return [
            {
                "stage": r.name,
                "skipped": r.skipped,
                "rows": r.rows,
                "partitions": r.partitions,
                "seconds": round(r.seconds, 3),
            }
            for r in self.results
        ]

    def lineage(self) -> Optional[DataFrame]:
        p = self.root / "_lineage"
        if p.exists():
            return self.spark.read.parquet(str(p))
        return None
