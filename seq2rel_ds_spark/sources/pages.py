"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Pages embed mentions of a synthetic knowledge base plus relation-bearing
sentences, so the full extraction stack (extract -> mention -> link ->
cluster -> triples) has a recoverable gold standard: ``gold_triples`` yields
exactly the triples a perfect pipeline must emit.

Generation is seeded *per url id* (md5-keyed), so output is byte-identical
regardless of partitioning, parallelism, or row order — the property the
byte-identical-extraction invariant and the two-cluster-size bench rely on.
Generation runs distributed (mapInPandas over spark.range) — there is no
driver-side materialization, so the same generator scales to arbitrary row
counts.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- synthetic knowledge base ------------------------------------------------

_DRUG_STEMS = [
    "vexa", "moro", "zeli", "quar", "plon", "brix", "dalu", "ferv", "gron", "hyra",
]
_DISEASE_STEMS = [
    "cardi", "derm", "neuro", "hepat", "pulmo", "gastr", "nephr", "osteo", "myel", "retin",
]
_FILLER = (
    "patients cohort study results reported clinical trial subjects dose "
    "baseline outcome weekly observed analysis placebo group random"
).split()

PREDICATES = {"causes": "CAUSES", "treats": "TREATS"}


def knowledge_base(n_drugs: int = 40, n_diseases: int = 40) -> Tuple[list, list]:
    """(entities, relations-free) synthetic KB.  Each entity has 2 surface
    forms (canonical + alias) — aliases exercise coref clustering."""
    entities = []
    for i in range(n_drugs):
        stem = _DRUG_STEMS[i % len(_DRUG_STEMS)]
        canonical = f"{stem}nib{i}"
        alias = f"{stem}-{i}"
        entities.append({"uid": f"DRUG{i}", "label": "DRUG", "surfaces": [canonical, alias]})
    for i in range(n_diseases):
        stem = _DISEASE_STEMS[i % len(_DISEASE_STEMS)]
        canonical = f"{stem}osis{i}"
        alias = f"{stem} syndrome {i}"
        entities.append(
            {"uid": f"DIS{i}", "label": "DISEASE", "surfaces": [canonical, alias]}
        )
    return entities, []


def _rng_ints(key: str, n: int, mod: int) -> List[int]:
    """n deterministic integers in [0, mod) derived from md5(key:i)."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{key}:{i}".encode()).hexdigest()
        out.append(int(h[:12], 16) % mod)
    return out


def _compose_doc(doc_id: int, entities: list) -> Tuple[str, str, list]:
    """Compose one page: (title, sentences, gold_triples).

    Sentence plan (all deterministic in doc_id):
      * 1 title naming the first drug
      * per (drug, disease) pair: one relation sentence "X causes|treats Y."
      * alias sentences re-mentioning entities by their alias (coref)
      * filler sentences
    """
    drugs = [e for e in entities if e["label"] == "DRUG"]
    diseases = [e for e in entities if e["label"] == "DISEASE"]
    k_drugs = 1 + _rng_ints(f"kd:{doc_id}", 1, 2)[0]
    k_dis = 1 + _rng_ints(f"ks:{doc_id}", 1, 2)[0]
    picked_drugs = [drugs[j] for j in _rng_ints(f"d:{doc_id}", k_drugs, len(drugs))]
    picked_dis = [diseases[j] for j in _rng_ints(f"s:{doc_id}", k_dis, len(diseases))]
    # de-dup picks while preserving order
    picked_drugs = list({e["uid"]: e for e in picked_drugs}.values())
    picked_dis = list({e["uid"]: e for e in picked_dis}.values())

    preds = sorted(PREDICATES)
    title = f"Report {doc_id} on {picked_drugs[0]['surfaces'][0]} outcomes."
    sentences = []
    gold = []
    for di, drug in enumerate(picked_drugs):
        for si, dis in enumerate(picked_dis):
            pred_word = preds[_rng_ints(f"p:{doc_id}:{di}:{si}", 1, len(preds))[0]]
            sentences.append(
                f"{drug['surfaces'][0]} {pred_word} {dis['surfaces'][0]} in most cases."
            )
            gold.append((drug["uid"], PREDICATES[pred_word], dis["uid"]))
    # alias (coref) sentences — no relation verbs
    for e in picked_drugs + picked_dis:
        sentences.append(f"Records also list {e['surfaces'][1]} under observation.")
    # filler
    n_fill = 2 + _rng_ints(f"f:{doc_id}", 1, 3)[0]
    for fi in range(n_fill):
        words = [
            _FILLER[j]
            for j in _rng_ints(f"w:{doc_id}:{fi}", 6 + (fi % 3), len(_FILLER))
        ]
        sentences.append(" ".join(words) + ".")
    return title, sentences, sorted(set(gold))


def _render_html(title: str, sentences: List[str]) -> bytes:
    """One <p> per sentence (periods kept inside); extraction joins tag
    contents with single spaces, reproducing page_text byte-identically."""
    paras = "".join(f"<p>{s}</p>" for s in sentences)
    return (
        f"<html><head><title>{title}</title></head><body>{paras}</body></html>"
    ).encode("utf-8")


def page_text(title: str, body: str) -> str:
    """The byte-exact extraction target for a generated page."""
    return f"{title} {body}"


_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def synthesize_pages(spark: SparkSession, n_docs: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic pages table of n_docs rows."""
    entities, _ = knowledge_base()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                title, sentences, _gold = _compose_doc(doc_id, entities)
                rows["url"].append(f"https://synth.example/{doc_id}")
                rows["warc_ts"].append(
                    datetime(2024, 1, 1, tzinfo=timezone.utc)
                )
                rows["html"].append(_render_html(title, sentences))
                rows["text"].append(page_text(title, " ".join(sentences)))
                rows["lang"].append("en")
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=_PAGES_SCHEMA)
    )


def gold_triples(spark: SparkSession, n_docs: int, partitions: int = 32) -> DataFrame:
    """The exact triples a perfect pipeline must emit for synthesize_pages."""
    entities, _ = knowledge_base()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, subjs, preds, objs = [], [], [], []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                _, _, gold = _compose_doc(doc_id, entities)
                for s, p, o in gold:
                    urls.append(f"https://synth.example/{doc_id}")
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
            yield pd.DataFrame({"url": urls, "subj": subjs, "pred": preds, "obj": objs})

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(
        gen, schema="url string, subj string, pred string, obj string"
    )


def dictionary_df(spark: SparkSession) -> DataFrame:
    """Surface-form dictionary (surface, uid, label, is_canonical) — the
    broadcast dimension for mention detection + linking."""
    entities, _ = knowledge_base()
    rows = []
    for e in entities:
        for i, s in enumerate(e["surfaces"]):
            rows.append((s, e["uid"], e["label"], i == 0))
    return spark.createDataFrame(
        rows, "surface string, uid string, label string, is_canonical boolean"
    )
