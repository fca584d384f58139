"""Regression net for the driver contract (__spark_entry__):

* every queries() entry has an oracle_sql() entry and vice versa
* every Spark query ANALYZES against the sf0.001 tables (catches schema
  drift / broken column references without paying full execution)
* every oracle parses and binds in DuckDB against the same tables
  (EXPLAIN — catches SQL syntax/column breakage cheaply)

Value-level equivalence is the driver's job (replicated in
tools/check_oracles.py); this test keeps the registry from silently
rotting between those runs.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def test_registry_keys_match():
    assert set(em.queries()) == set(em.oracle_sql())


def test_every_query_analyzes(spark):
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        assert df.columns, name


def test_every_oracle_binds_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in em.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover - assertion formatting
            pytest.fail(f"oracle {name} failed to bind: {e}")
