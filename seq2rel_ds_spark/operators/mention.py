"""Sentence-windowed dictionary mention detection (batched, vectorized).

Stage contract (north_star): text -> (url, sent_idx, start, end, surface,
sent_start) mention rows, via a broadcast surface dictionary compiled into
one alternation regex (longest-surface-first so compound surfaces win over
their prefixes).  Runs as mapInPandas over Arrow batches: the dictionary is
compiled once per executor task, matching is C-speed (re engine) per batch —
no per-row Python round trips, no shuffle.

Offsets are document-level character spans (sentence start + in-sentence
match span) so downstream ordering semantics match the parse path.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENT_SPLIT = re.compile(r"(?<=\.)\s+")

MENTION_SCHEMA = (
    "url string, sent_idx int, sent_start int, start int, end int, surface string"
)


def _compile_dictionary(surfaces: List[str]) -> "re.Pattern":
    ordered = sorted(set(surfaces), key=lambda s: (-len(s), s))
    return re.compile(r"\b(" + "|".join(re.escape(s) for s in ordered) + r")\b")


def detect_mentions(texts: DataFrame, surfaces: List[str], text_col: str = "text") -> DataFrame:
    """texts(url, text) -> mention rows.  ``surfaces`` rides to executors in
    the serialized closure (broadcast-equivalent for a dictionary of this
    size; a full-scale run would swap in ``SparkContext.broadcast``)."""
    pattern_surfaces = list(surfaces)

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = _compile_dictionary(pattern_surfaces)
        for pdf in batches:
            out = {k: [] for k in ("url", "sent_idx", "sent_start", "start", "end", "surface")}
            for url, text in zip(pdf["url"], pdf[text_col]):
                pos = 0
                for sent_idx, sent in enumerate(_SENT_SPLIT.split(text)):
                    sent_start = text.index(sent, pos)
                    pos = sent_start + len(sent)
                    for m in pat.finditer(sent):
                        out["url"].append(url)
                        out["sent_idx"].append(sent_idx)
                        out["sent_start"].append(sent_start)
                        out["start"].append(sent_start + m.start())
                        out["end"].append(sent_start + m.end())
                        out["surface"].append(m.group(0))
            yield pd.DataFrame(out)

    return texts.select("url", text_col).mapInPandas(find, schema=MENTION_SCHEMA)


def link_mentions(mentions: DataFrame, dictionary: DataFrame, texts: DataFrame) -> DataFrame:
    """Dictionary + context entity linking.

    Broadcast-join mentions to candidate uids on surface; ambiguous surfaces
    (one surface, many uids) are resolved by a deterministic context score:
    count of *other* mentions in the same document whose candidate set
    contains the same uid's label — a label-coherence prior — with (score
    desc, uid asc) tie-break.  All Catalyst: join + window, no Python.
    """
    cands = mentions.join(F.broadcast(dictionary), "surface", "inner")
    # label-coherence score: per (url, label) mention count
    label_freq = cands.groupBy("url", "label").agg(F.count("*").alias("label_hits"))
    scored = cands.join(label_freq, ["url", "label"], "left")
    from pyspark.sql import Window

    w = Window.partitionBy("url", "start", "end").orderBy(
        F.desc("label_hits"), F.desc("is_canonical"), F.asc("uid")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("url", "sent_idx", "sent_start", "start", "end", "surface", "uid", "label")
    )
