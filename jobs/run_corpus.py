"""spark-submit CLI mirroring the reference's per-corpus typer app
(/root/reference/seq2rel_ds/main.py:8-14: `seq2rel-ds cdr|gda|docred|dgm
main OUTPUT_DIR ...`).

Each subcommand reads the corpus' native on-disk formats via the sources/
readers, runs the corresponding plans/corpora.py plan, and writes
train/valid/test.tsv (the reference's sink layout) with write_tsv.

    spark-submit --py-files seq2rel_ds_spark.zip jobs/run_corpus.py \
        cdr OUTPUT_DIR --train t.txt --valid v.txt --test s.txt \
        --mesh tree.tsv [--hints] [--combine-train-valid]

No network access anywhere: the reference CLIs download their corpora; this
engine takes the already-downloaded files as explicit paths (S2/S6 are
by-design local stand-ins — see SURVEY.md §2.1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(app: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(app).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_cdr(args: argparse.Namespace) -> dict:
    from seq2rel_ds_spark.plans.corpora import preprocess_cdr, write_tsv
    from seq2rel_ds_spark.sources.mesh import read_mesh_tree
    from seq2rel_ds_spark.sources.pubtator import read_pubtator

    spark = _spark("seq2rel-ds-cdr")
    splits = preprocess_cdr(
        read_pubtator(spark, args.train),
        read_pubtator(spark, args.valid) if args.valid else None,
        read_pubtator(spark, args.test),
        read_mesh_tree(spark, args.mesh),
        hints=args.hints,
        combine_train_valid=args.combine_train_valid,
        sort_rels=not args.no_sort_rels,
    )
    return write_tsv(splits, args.output_dir)


def cmd_gda(args: argparse.Namespace) -> dict:
    from seq2rel_ds_spark.plans.corpora import preprocess_gda, write_tsv
    from seq2rel_ds_spark.sources.gda import read_gda

    spark = _spark("seq2rel-ds-gda")
    splits = preprocess_gda(
        read_gda(spark, args.train_abstracts, args.train_anns, args.train_labels),
        read_gda(spark, args.test_abstracts, args.test_anns, args.test_labels),
        valid_size=args.valid_size,
        hints=args.hints,
        sort_rels=not args.no_sort_rels,
    )
    return write_tsv(splits, args.output_dir)


def cmd_docred(args: argparse.Namespace) -> dict:
    from seq2rel_ds_spark.plans.corpora import preprocess_docred, write_tsv
    from seq2rel_ds_spark.sources.docred import read_docred

    spark = _spark("seq2rel-ds-docred")
    rel_labels = None
    if args.types:
        with open(args.types) as fh:
            rel_labels = {
                k: v["verbose"] for k, v in json.load(fh)["relations"].items()
            }
    splits = preprocess_docred(
        {
            name: read_docred(spark, path, rel_labels)
            for name, path in (
                ("train", args.train),
                ("valid", args.valid),
                ("test", args.test),
            )
            if path
        },
        hints=args.hints,
        sort_rels=not args.no_sort_rels,
    )
    return write_tsv(splits, args.output_dir)


def cmd_dgm(args: argparse.Namespace) -> dict:
    from seq2rel_ds_spark.plans.corpora import preprocess_dgm, write_tsv
    from seq2rel_ds_spark.sources.dgm import read_dgm

    spark = _spark("seq2rel-ds-dgm")
    splits = preprocess_dgm(
        read_dgm(spark, args.data),
        spark.read.text(args.train_pmids),
        spark.read.text(args.dev_pmids),
        valid_size=args.valid_size,
        hints=args.hints,
        sort_rels=not args.no_sort_rels,
    )
    return write_tsv(splits, args.output_dir)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="run_corpus")
    sub = ap.add_subparsers(dest="corpus", required=True)

    cdr = sub.add_parser("cdr")
    cdr.add_argument("output_dir")
    cdr.add_argument("--train", required=True)
    cdr.add_argument("--valid")
    cdr.add_argument("--test", required=True)
    cdr.add_argument("--mesh", required=True)
    cdr.add_argument("--hints", action="store_true")
    cdr.add_argument("--combine-train-valid", action="store_true")
    cdr.add_argument("--no-sort-rels", action="store_true", help="ablation: seeded shuffle instead of first-appearance relation order")
    cdr.set_defaults(fn=cmd_cdr)

    gda = sub.add_parser("gda")
    gda.add_argument("output_dir")
    for split in ("train", "test"):
        gda.add_argument(f"--{split}-abstracts", required=True)
        gda.add_argument(f"--{split}-anns", required=True)
        gda.add_argument(f"--{split}-labels", required=True)
    gda.add_argument("--valid-size", type=float, default=0.2)
    gda.add_argument("--hints", action="store_true")
    gda.add_argument("--no-sort-rels", action="store_true", help="ablation: seeded shuffle instead of first-appearance relation order")
    gda.set_defaults(fn=cmd_gda)

    docred = sub.add_parser("docred")
    docred.add_argument("output_dir")
    docred.add_argument("--train", required=True)
    docred.add_argument("--valid")
    docred.add_argument("--test")
    docred.add_argument("--types", help="types.json with relations.*.verbose")
    docred.add_argument("--hints", action="store_true")
    docred.add_argument("--no-sort-rels", action="store_true", help="ablation: seeded shuffle instead of first-appearance relation order")
    docred.set_defaults(fn=cmd_docred)

    dgm = sub.add_parser("dgm")
    dgm.add_argument("output_dir")
    dgm.add_argument("--data", required=True, help="DGM JSONL examples")
    dgm.add_argument("--train-pmids", required=True)
    dgm.add_argument("--dev-pmids", required=True)
    dgm.add_argument("--valid-size", type=float, default=0.2)
    dgm.add_argument("--hints", action="store_true")
    dgm.add_argument("--no-sort-rels", action="store_true", help="ablation: seeded shuffle instead of first-appearance relation order")
    dgm.set_defaults(fn=cmd_dgm)

    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    t0 = time.time()
    counts = args.fn(args)
    print(
        json.dumps(
            {
                "corpus": args.corpus,
                "output_dir": args.output_dir,
                "rows": counts,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
