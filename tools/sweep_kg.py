"""Config sweep for the flagship scaling legs (diagnostic, not a recorded
bench).  Generates the pages input once, then runs single legs under varying
configs with the same steal/probe instrumentation as bench.py, printing one
JSON line per run.  Used to find which knob the 32-core leg's non-scaling
overhead hides behind (split size, Arrow batch, AQE, shuffle width, agg).

Usage:  python tools/sweep_kg.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

CONFIGS = [
    # (name, cores, env overrides)
    ("b20k_32", 32, {"SPARK_GRAFT_ARROW_BATCH": "20000"}),
    ("b20k_8", 8, {"SPARK_GRAFT_ARROW_BATCH": "20000"}),
    (
        "b20k_s8m_32",
        32,
        {"SPARK_GRAFT_ARROW_BATCH": "20000", "SPARK_GRAFT_MAX_PARTITION_BYTES": "8m"},
    ),
    (
        "b20k_s8m_8",
        8,
        {"SPARK_GRAFT_ARROW_BATCH": "20000", "SPARK_GRAFT_MAX_PARTITION_BYTES": "8m"},
    ),
    (
        "b20k_s16m_32",
        32,
        {"SPARK_GRAFT_ARROW_BATCH": "20000", "SPARK_GRAFT_MAX_PARTITION_BYTES": "16m"},
    ),
    ("b10k_32", 32, {"SPARK_GRAFT_ARROW_BATCH": "10000"}),
    ("b10k_8", 8, {"SPARK_GRAFT_ARROW_BATCH": "10000"}),
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_560_000
    reps = int(os.environ.get("SWEEP_REPS", "2"))

    import shutil
    import tempfile

    from seq2rel_ds_spark.session import get_spark
    from seq2rel_ds_spark.sources.pages import synthesize_pages

    probe_calib = min(bench._busy_probe(), bench._busy_probe())
    spark = get_spark(app_name="sweep-gen", cores=32, shuffle_partitions=64)
    kg_dir = tempfile.mkdtemp(prefix="sweep_kg_pages_")
    pages_path = f"{kg_dir}/pages"
    synthesize_pages(spark, n_docs, partitions=256).write.parquet(pages_path)
    spark.stop()
    try:
        for rep in range(reps):
            for name, cores, env in CONFIGS:
                saved = {k: os.environ.get(k) for k in env}
                os.environ.update(env)
                try:
                    r = bench._measured_kg(cores, pages_path, probe_calib)
                finally:
                    for k, v in saved.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
                out = {"config": name, "rep": rep, "cores": cores}
                out.update(r or {"seconds": None})
                print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(kg_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
