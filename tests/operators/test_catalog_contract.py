"""Catalog swap contract (VERDICT r5 stretch item): the write/read surface
any TripleCatalog implementation must honour, so the documented
"s/parquet+manifest/iceberg/" swap is pinned by tests rather than a comment.

Two halves:
  * TestTripleCatalogContract — the full behavioural contract, executed
    against the parquet+manifest implementation (the only one runnable in
    this sandbox): snapshot-commit semantics, partition pruning on pred,
    bucket pruning on subj point reads, overwrite atomicity, listing.
  * TestIcebergSwapSurface — the IcebergTripleCatalog call surface up to
    catalog resolution (this sandbox has no iceberg runtime jar): the
    DataFrameWriterV2 chain with the hidden bucket transform must be
    constructible and fail ONLY at "catalog not found" — i.e. the swap
    needs a jar + catalog config, not code changes.
"""

import json

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _triples(spark):
    rows = [
        (f"s{i % 7}", "TREATS" if i % 2 == 0 else "CAUSES", f"o{i}", i)
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, n_support long"
    )


class TestTripleCatalogContract:
    """Every clause here is part of the swap contract — an Iceberg-backed
    implementation must pass this class unchanged (with pruning asserted
    via its scan's own partition filters)."""

    def _cat(self, spark, tmp_path):
        from seq2rel_ds_spark.plans.catalog import TripleCatalog

        return TripleCatalog(spark, str(tmp_path), subj_buckets=4)

    def test_write_commits_a_consistent_snapshot(self, spark, tmp_path):
        """write_triples returns a readable location whose manifest was
        written AFTER the data and describes exactly what a reader sees:
        row count, partition spec, schema — the snapshot-commit clause
        (Iceberg: the metadata-pointer swap)."""
        cat = self._cat(spark, tmp_path)
        df = _triples(spark)
        path = cat.write_triples(df, name="t_contract")
        manifest = json.loads((tmp_path / "t_contract" / "_catalog_manifest.json").read_text())
        back = cat.read_triples("t_contract")
        assert manifest["rows"] == back.count() == 60
        assert any("pred" in p for p in manifest["partition_spec"])
        assert any("subj_bucket" in p for p in manifest["partition_spec"])
        assert sorted(back.schema.fieldNames()) == sorted(
            ["subj", "pred", "obj", "n_support", "subj_bucket"]
        )
        # round-trip value equality on the logical columns
        assert {tuple(r) for r in back.select("subj", "pred", "obj", "n_support").collect()} == {
            tuple(r) for r in df.collect()
        }
        assert path  # a usable location/identifier is part of the contract

    def test_overwrite_replaces_previous_snapshot(self, spark, tmp_path):
        """A second write_triples to the same name fully replaces the first
        (rows AND manifest) — commit, not append."""
        cat = self._cat(spark, tmp_path)
        cat.write_triples(_triples(spark), name="t_ow")
        small = _triples(spark).filter(F.col("pred") == "TREATS")
        cat.write_triples(small, name="t_ow")
        manifest = json.loads((tmp_path / "t_ow" / "_catalog_manifest.json").read_text())
        assert manifest["rows"] == cat.read_triples("t_ow").count() == 30

    def test_pred_read_prunes_partitions(self, spark, tmp_path):
        """read_triples(pred=...) must reach the scan as a PARTITION filter
        (directory/manifest pruning), not a post-scan row filter."""
        cat = self._cat(spark, tmp_path)
        cat.write_triples(_triples(spark), name="t_pred")
        out = cat.read_triples("t_pred", pred="TREATS")
        plan = _plan(out)
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "pred" in pf
        assert out.count() == 30

    def test_subj_point_read_prunes_to_one_bucket(self, spark, tmp_path):
        """read_triples(subj=...) must prune to the subj's hash bucket at
        the PARTITION level (Iceberg: the hidden bucket transform) and
        return exactly that subject's rows."""
        cat = self._cat(spark, tmp_path)
        cat.write_triples(_triples(spark), name="t_subj")
        out = cat.read_triples("t_subj", subj="s3")
        plan = _plan(out)
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "subj_bucket" in pf
        got = out.select("subj", "obj").collect()
        assert got and all(r["subj"] == "s3" for r in got)
        assert len(got) == sum(1 for i in range(60) if i % 7 == 3)

    def test_tables_lists_written_names(self, spark, tmp_path):
        cat = self._cat(spark, tmp_path)
        cat.write_triples(_triples(spark), name="t_a")
        cat.write_triples(_triples(spark), name="t_b")
        assert {"t_a", "t_b"}.issubset(set(cat.tables()))


class TestIcebergSwapSurface:
    """No iceberg jar in the sandbox, so execution stops at catalog
    resolution — everything BEFORE that point is the code this repo owns,
    and this pins it: the V2 writer chain (with bucket transform) builds,
    and running it fails with catalog-not-found, not with a malformed-plan
    or bad-transform error."""

    def test_writer_chain_builds_with_bucket_transform(self, spark):
        from seq2rel_ds_spark.plans.catalog import IcebergTripleCatalog

        cat = IcebergTripleCatalog(spark, "ice", namespace="kg", subj_buckets=16)
        writer = cat.triple_writer(_triples(spark), name="triples")
        # a real DataFrameWriterV2 with the chain applied — constructing it
        # validates partitionedBy(col, bucket(n, col)) + using("iceberg")
        # against the pyspark API surface
        from pyspark.sql.readwriter import DataFrameWriterV2

        assert isinstance(writer, DataFrameWriterV2)

    def test_execution_stops_exactly_at_catalog_resolution(self, spark):
        """createOrReplace against an unconfigured catalog must raise the
        catalog-resolution error — proving the plan (ident, partition
        transforms, provider) was otherwise accepted, i.e. the swap is
        config-only from here."""
        from pyspark.errors import AnalysisException

        from seq2rel_ds_spark.plans.catalog import IcebergTripleCatalog

        cat = IcebergTripleCatalog(spark, "ice_missing", subj_buckets=8)
        with pytest.raises(AnalysisException) as ei:
            cat.write_triples(_triples(spark), name="triples")
        msg = str(ei.value).lower()
        assert "ice_missing" in msg or "catalog" in msg

    def test_read_surface_uses_table_idents_and_raw_subj(self, spark):
        """The read side must address tables by catalog.namespace.name and
        filter on RAW subj (hidden partitioning — no caller-side bucket
        arithmetic).  Verified structurally: the generated identifier and
        the absence of any xxhash64/bucket column in the filter chain."""
        from seq2rel_ds_spark.plans.catalog import IcebergTripleCatalog

        cat = IcebergTripleCatalog(spark, "ice", namespace="kg")
        assert cat._ident("triples") == "ice.kg.triples"
        import inspect

        src = inspect.getsource(IcebergTripleCatalog.read_triples)
        assert "xxhash64" not in src and "subj_bucket" not in src
