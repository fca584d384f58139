"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB at the given scale, compare
row-count, schema width, and order-insensitive values (columns sorted by
name, rows sorted)."""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from seq2rel_ds_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    spark = get_spark(app_name="oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        a, b = norm_rows(spark_cols, spark_rows), norm_rows(duck_cols, duck_rows)
        ok_vals = a == b
        if ok_cols and ok_vals:
            # spark-side wall seconds beside each row count: a gate that
            # creeps toward the driver harness's time budget shows up here
            print(f"OK    {name}: {len(spark_rows)} rows ({time.monotonic() - t0:.1f}s)")
        else:
            failures += 1
            print(
                f"FAIL  {name}: cols {sorted(spark_cols)} vs {sorted(duck_cols)}; "
                f"rows {len(a)} vs {len(b)}"
            )
            for x, y in list(zip(a, b))[:3]:
                if x != y:
                    print(f"      spark={x}\n      duck ={y}")
            extra_s = [r for r in a if r not in set(b)][:2]
            extra_d = [r for r in b if r not in set(a)][:2]
            if extra_s:
                print(f"      only-spark: {extra_s}")
            if extra_d:
                print(f"      only-duck:  {extra_d}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
