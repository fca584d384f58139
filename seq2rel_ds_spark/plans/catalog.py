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
from pyspark.sql.functions import partitioning as P


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


class IcebergTripleCatalog:
    """The documented swap target: the SAME contract as :class:`TripleCatalog`
    (write_triples / read_triples / write_triples_bucketed / tables), routed
    through Spark's DataFrameWriterV2 into a configured Iceberg catalog.

    What maps where:
      * partitionBy("pred", "subj_bucket") + manual xxhash64 bucketing
        -> ``partitionedBy(col("pred"), bucket(n, col("subj")))`` — Iceberg's
        hidden bucket transform, so readers filter on raw ``subj`` and the
        catalog prunes to one bucket without a caller-computed bucket column
      * the JSON ``_catalog_manifest.json`` snapshot -> Iceberg's own atomic
        manifest/snapshot commit (``createOrReplace`` is a single metadata
        swap; a concurrent reader sees the old or the new snapshot, never a
        partial directory)
      * ``bucketBy(...).saveAsTable`` co-location -> the same bucket
        transform; Iceberg's storage-partitioned joins give the
        zero-exchange subj self-join

    This sandbox has no iceberg-spark-runtime jar and no catalog configured,
    so execution stops at catalog resolution — the call SURFACE up to that
    point (DataFrameWriterV2 chain with the bucket transform, table-ident
    reads) is pinned by tests/operators/test_catalog_contract.py, which also
    runs the full behavioural contract against :class:`TripleCatalog`.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        namespace: str = "kg",
        subj_buckets: int = 16,
    ):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.subj_buckets = subj_buckets

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def triple_writer(self, triples: DataFrame, name: str = "triples"):
        """The DataFrameWriterV2 chain for the triple table — exposed so the
        contract test can pin the call surface without a live catalog."""
        return (
            triples.writeTo(self._ident(name))
            .partitionedBy(F.col("pred"), P.bucket(self.subj_buckets, F.col("subj")))
            .using("iceberg")
        )

    def write_triples(self, triples: DataFrame, name: str = "triples") -> str:
        # createOrReplace = one atomic snapshot commit (Iceberg writes data
        # files first, then swaps the table metadata pointer)
        self.triple_writer(triples, name).createOrReplace()
        return self._ident(name)

    def read_triples(
        self, name: str = "triples", pred: Optional[str] = None, subj: Optional[str] = None
    ) -> DataFrame:
        df = self.spark.read.table(self._ident(name))
        if pred is not None:
            df = df.filter(F.col("pred") == pred)
        if subj is not None:
            # hidden partitioning: the raw subj equality is enough — Iceberg
            # applies its own bucket transform for pruning; no engine-side
            # hash/bucket recomputation like the parquet impl needs
            df = df.filter(F.col("subj") == subj)
        return df

    def write_triples_bucketed(
        self, triples: DataFrame, name: str = "triples_bucketed", buckets: Optional[int] = None
    ) -> str:
        n = buckets or self.subj_buckets
        (
            triples.writeTo(self._ident(name))
            .partitionedBy(P.bucket(n, F.col("subj")))
            .using("iceberg")
            .createOrReplace()
        )
        return self._ident(name)

    def tables(self) -> List[str]:
        rows = self.spark.sql(
            f"SHOW TABLES IN {self.catalog}.{self.namespace}"
        ).collect()
        return sorted(r["tableName"] for r in rows)
