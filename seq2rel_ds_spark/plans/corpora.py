"""End-to-end corpus preprocessing plans — the engine's equivalents of the
reference CLIs (`seq2rel-ds cdr|gda|docred|dgm main`).

Each plan takes normalized document DataFrames (from ``sources``) and
returns the split -> linearized-lines DataFrames the reference writes as
train/valid/test.tsv.  Differences from the reference are scale-driven, not
semantic:

  * splits are deterministic hash splits (or seeded randomSplit) instead of
    in-memory sklearn splits (util.py:93-111) — row-exact sklearn splits
    don't distribute
  * "pipeline" entity hinting (live PubTator API, util.py:256-274) becomes
    an optional ``hint_source`` DataFrame join: docs joining get their text
    replaced (inner-join drop semantics match the reference's warn+skip)
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seq2rel_ds_spark.operators.hypernym import filter_hypernyms
from seq2rel_ds_spark.operators.linearize import linearize
from seq2rel_ds_spark.operators.parse import parse_documents
from seq2rel_ds_spark.operators.split import hash_split


def apply_hint_source(parsed: DataFrame, hint_source: Optional[DataFrame]) -> DataFrame:
    """Replace doc text with externally-hinted text (J7 semantics: docs
    without a hint row are dropped, matching util.py:266-274)."""
    if hint_source is None:
        return parsed
    hs = hint_source.select("doc_id", F.col(hint_source.columns[1]).alias("_hinted"))
    return (
        parsed.join(hs, "doc_id", "inner")
        .withColumn("text", F.col("_hinted"))
        .drop("_hinted")
    )


def preprocess_cdr(
    train_docs: DataFrame,
    valid_docs: Optional[DataFrame],
    test_docs: DataFrame,
    mesh: DataFrame,
    hints: bool = False,
    combine_train_valid: bool = False,
    hint_source: Optional[DataFrame] = None,
    sort_rels: bool = True,
) -> Dict[str, DataFrame]:
    """CDR plan (cdr.py:127-181): train parses without hypernym filtering;
    valid/test parse WITH it (gaining the third tab column); optional
    train+valid concatenation."""
    if combine_train_valid and valid_docs is not None:
        train_docs = train_docs.unionByName(valid_docs)
        valid_docs = None
    out = {}
    train = parse_documents(train_docs)
    out["train"] = linearize(apply_hint_source(train, hint_source), hints=hints, sort_rels=sort_rels)
    for name, docs in (("valid", valid_docs), ("test", test_docs)):
        if docs is None:
            continue
        parsed = filter_hypernyms(parse_documents(docs), mesh)
        out[name] = linearize(apply_hint_source(parsed, hint_source), hints=hints, sort_rels=sort_rels)
    return out


def preprocess_gda(
    train_docs: DataFrame,
    test_docs: DataFrame,
    valid_size: float = 0.2,
    hints: bool = False,
    sort_rels: bool = True,
) -> Dict[str, DataFrame]:
    """GDA plan (gda.py:109-158): preprocess train/test, hold out
    ``valid_size`` of train as validation (deterministic hash split)."""
    train_all = linearize(parse_documents(train_docs), hints=hints, sort_rels=sort_rels)
    out = {"test": linearize(parse_documents(test_docs), hints=hints, sort_rels=sort_rels)}
    if valid_size and valid_size > 0:
        parts = hash_split(
            train_all, "doc_id", weights=(1.0 - valid_size, valid_size), salt="gda"
        )
        out["train"], out["valid"] = parts["train"], parts["valid"]
    else:
        out["train"] = train_all
    return out


def preprocess_docred(
    splits: Dict[str, DataFrame], hints: bool = False, sort_rels: bool = True
) -> Dict[str, DataFrame]:
    """DocRED plan (docred.py:86-115): every split parses with
    text_segment=abstract (title is empty by construction)."""
    return {
        name: linearize(
            parse_documents(docs, text_segment="abstract", reanchor=False),
            hints=hints,
            sort_rels=sort_rels,
        )
        for name, docs in splits.items()
    }


def preprocess_dgm(
    docs: DataFrame,
    train_pmids: DataFrame,
    dev_pmids: DataFrame,
    valid_size: float = 0.2,
    hints: bool = False,
    sort_rels: bool = True,
) -> Dict[str, DataFrame]:
    """DGM plan (dgm.py:90-167): pmid-list membership decides train vs test
    (the original dev set serves as test); ``valid_size`` of train is held
    out as validation."""
    from seq2rel_ds_spark.sources.dgm import filter_by_pmids

    train_raw = filter_by_pmids(docs, train_pmids)
    test_raw = filter_by_pmids(docs, dev_pmids)
    train_all = linearize(
        parse_documents(train_raw, text_segment="abstract", reanchor=False),
        hints=hints,
        sort_rels=sort_rels,
    )
    out = {
        "test": linearize(
            parse_documents(test_raw, text_segment="abstract", reanchor=False),
            hints=hints,
            sort_rels=sort_rels,
        )
    }
    if valid_size and valid_size > 0:
        parts = hash_split(
            train_all, "doc_id", weights=(1.0 - valid_size, valid_size), salt="dgm"
        )
        out["train"], out["valid"] = parts["train"], parts["valid"]
    else:
        out["train"] = train_all
    return out


def write_tsv(splits: Dict[str, DataFrame], output_dir: str) -> Dict[str, int]:
    """Reference-parity sink: one TSV per split (line column only).

    Lines already contain internal tabs, so they are written as raw text.
    Returns per-split row counts read back from the WRITTEN files — counting
    the output costs one cheap text scan, where counting the input DataFrame
    would recompute the whole parse->linearize lineage a second time.
    """
    spark = next(iter(splits.values())).sparkSession
    counts = {}
    for name, df in splits.items():
        path = f"{output_dir}/{name}.tsv"
        # an embedded newline would be written as multiple physical lines —
        # silently corrupting the TSV and inflating the read-back counts.
        # raise_error inside the write job fails loudly per offending row
        # (no extra pass; linearize output is newline-free by construction,
        # this guards hint_source-supplied text)
        checked = df.select(
            F.when(
                F.col("line").contains("\n") | F.col("line").contains("\r"),
                F.raise_error(
                    F.concat(
                        F.lit("write_tsv: line contains a newline: "),
                        F.substring("line", 1, 80),
                    )
                ),
            )
            .otherwise(F.col("line"))
            .alias("line")
        )
        checked.write.mode("overwrite").text(path)
        counts[name] = spark.read.text(path).count()
    return counts
