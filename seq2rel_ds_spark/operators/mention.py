"""Sentence-windowed dictionary scanning (batched, vectorized).

One Arrow pass over the extracted text does ALL sentence-window work the
downstream stages need:
  * mention rows    — dictionary surface hits (longest-surface-first regex)
  * predicate cues  — relation cue-word hits (when a predicate dict is given)

Emitting both from the single scan matters at scale: the alternative
(re-joining sentences against full document text later) ships every document
body through a shuffle once per consumer.  Here text is read exactly once and
only small typed rows flow on.

Offsets are document-level character spans (sentence start + in-sentence
match span) so downstream ordering matches the parse path's semantics.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENT_SPLIT = re.compile(r"(?<=\.)\s+")
# Fast twin of _SENT_SPLIT for computing boundary END positions only: the
# literal '.' prefix lets the regex engine skip between dots (memchr)
# instead of probing the lookbehind at every position — measured 2.9x
# faster.  End-equivalence proof: both enumerate the maximal \s+ runs whose
# preceding char is '.'; finditer's non-overlap cannot lose a run because a
# '.' is never inside the previously consumed \s+ run, and m.end() is the
# run end in both.  (Match STARTS differ — use only .end().)
_SENT_BOUND_FAST = re.compile(r"\.\s+")

# ASCII \w exactly as re.ASCII's \b sees it — used by the find()-based cue
# scanner to replicate \b(word)\b token semantics in C-level substring scans
_ASCII_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


def _sent_bounds(text: str) -> list:
    """Sentence boundary end-offsets (see _SENT_BOUND_FAST equivalence)."""
    return [m.end() for m in _SENT_BOUND_FAST.finditer(text)]


def _make_cue_scanner(preds: dict, ascii_boundaries: bool):
    """text -> [(start, word)] sorted by position, equal to the cue regex's
    finditer output.

    Fast path (all cues are ASCII \\w+ and ascii_boundaries): one C-level
    str.find() loop per cue word with manual \\b neighbor checks — measured
    2.8x faster than the \\b(alt|...)\\b regex scan.  Equivalence: a
    \\b-delimited match spans a complete token, so matches of distinct
    whole words never overlap and position-sorting reproduces finditer
    order; the i+1 step cannot skip a valid match because a new \\b match
    cannot start inside the word-char run just matched.  Falls back to the
    regex scanner for non-word cues (spaces, punctuation) or unicode
    boundary semantics."""
    cue_pat = _compile_cue_pattern(preds, ascii_boundaries=ascii_boundaries)
    words = sorted(preds)
    if not ascii_boundaries or not all(
        w and all(ch in _ASCII_WORD for ch in w) for w in words
    ):
        def scan_regex(text: str) -> list:
            return [(c.start(), c.group(0)) for c in cue_pat.finditer(text)]

        return scan_regex

    def scan_find(text: str) -> list:
        out = []
        n = len(text)
        find = text.find
        for w in words:
            lw = len(w)
            i = find(w)
            while i >= 0:
                if (i == 0 or text[i - 1] not in _ASCII_WORD) and (
                    i + lw == n or text[i + lw] not in _ASCII_WORD
                ):
                    out.append((i, w))
                i = find(w, i + 1)
        out.sort()
        return out

    return scan_find

SCAN_SCHEMA = (
    "url string, sent_idx int, sent_start int, start int, end int, "
    "kind string, token string"
)

MENTION_COLUMNS = ["url", "sent_idx", "sent_start", "start", "end", "surface"]


def _compile_dictionary(surfaces: List[str], ascii_boundaries: bool = False) -> "re.Pattern":
    """Trie-compressed alternation over the surface dictionary.

    A flat longest-first alternation re-scans every alternative at every
    text position; sharing prefixes in a trie makes the match walk each
    position once (measured 5x faster on the bench dictionary — the scan
    regex is ~3/4 of the per-doc Python cost).  Match semantics are
    identical to the sorted(-len) alternation: within the trie,
    continuations are emitted BEFORE the terminal branch, so Python's
    leftmost-first backtracking yields the longest dictionary match at
    each position (prefix-comparable surfaces), and non-prefix surfaces
    can never match at the same position.  Equivalence is pinned by the
    fused-scan parity tests.

    ``ascii_boundaries=True`` compiles with ``re.ASCII`` so ``\\b`` tests
    ASCII word chars only — measured ~27%% faster scanning and
    match-identical whenever the corpus is ASCII (the synthetic bench
    corpus is, by construction).  Leave False for corpora that may contain
    non-ASCII word characters adjacent to dictionary hits.

    Alternatives evaluated and rejected (same 20k-doc measurement):
    a pure-Python token-level phrase matcher (Aho-Corasick at word
    granularity) runs 0.31x the speed of this pattern — the C regex
    engine's per-position scan beats any Python-level token loop — and
    the third-party ``regex`` module adds no speed for this shape.
    """
    # The downstream scanner (_scan_doc) matches once over the FULL text and
    # assigns sentence ids by offset — correct only while no surface can
    # cross a sentence boundary.  Enforce that assumption here instead of
    # documenting it: a surface containing a sentence split (". " etc.,
    # e.g. "U.S. Army") would silently match across sentences.
    for s in surfaces:
        if _SENT_SPLIT.search(s):
            raise ValueError(
                f"dictionary surface {s!r} contains a sentence boundary "
                f"({_SENT_SPLIT.pattern!r}); the single-pass scanner would "
                "match it across sentences — strip or re-tokenize it"
            )
    trie: dict = {}
    for s in sorted(set(surfaces)):
        node = trie
        for ch in s:
            node = node.setdefault(ch, {})
        node[""] = {}  # terminal marker

    # iterative post-order emit: surfaces are bounded only by memory, so the
    # pattern build must not recurse one frame per character of the longest
    # surface (a >1000-char surface would hit the interpreter recursion limit)
    order: List[dict] = []
    stack = [trie]
    while stack:
        node = stack.pop()
        order.append(node)
        for k in node:
            if k != "":
                stack.append(node[k])
    pats: Dict[int, str] = {}
    for node in reversed(order):
        alts = [re.escape(k) + pats[id(node[k])] for k in sorted(node) if k != ""]
        body = alts[0] if len(alts) == 1 else ("(?:" + "|".join(alts) + ")" if alts else "")
        if "" in node and body:
            body = "(?:" + body + ")?"
        pats[id(node)] = body

    return re.compile(
        r"\b(" + pats[id(trie)] + r")\b", re.ASCII if ascii_boundaries else 0
    )


def _compile_cue_pattern(words, ascii_boundaries: bool = False) -> "re.Pattern":
    """Cue-word alternation with the same no-sentence-boundary guarantee the
    dictionary pattern enforces (the single-pass scanner depends on it)."""
    for w in words:
        if _SENT_SPLIT.search(w):
            raise ValueError(
                f"predicate cue {w!r} contains a sentence boundary; the "
                "single-pass scanner would match it across sentences"
            )
    return re.compile(
        r"\b(" + "|".join(re.escape(w) for w in sorted(words)) + r")\b",
        re.ASCII if ascii_boundaries else 0,
    )


def _scan_doc(
    text: str,
    pat: "re.Pattern",
    cue_pat: Optional["re.Pattern"],
) -> Tuple[list, list]:
    """One full-text pass per pattern (not one per sentence): sentence ids
    are assigned to match offsets by bisect over the boundary list.  Match
    sets are identical to per-sentence scanning because no dictionary
    surface or cue contains a sentence terminator, so no match can cross a
    boundary; measured faster by skipping ~25 finditer calls + substring
    searches per document.

    Returns (mentions, cues): mentions = (sent_idx, sent_start, start, end,
    token); cues likewise with the raw cue word as token.
    """
    bounds = _sent_bounds(text)
    mentions = []
    for m in pat.finditer(text):
        s = m.start()
        si = bisect_right(bounds, s)
        mentions.append((si, bounds[si - 1] if si else 0, s, m.end(), m.group(0)))
    cues = []
    if cue_pat is not None:
        for c in cue_pat.finditer(text):
            s = c.start()
            si = bisect_right(bounds, s)
            cues.append((si, bounds[si - 1] if si else 0, s, c.end(), c.group(0)))
    return mentions, cues


def scan_sentences(
    texts: DataFrame,
    surfaces: List[str],
    predicates: Optional[Dict[str, str]] = None,
    text_col: str = "text",
) -> DataFrame:
    """texts(url, text) -> scan rows (kind = 'mention' | 'cue').

    For cue rows, ``token`` carries the predicate LABEL (not the cue word)
    and (start, end) the cue span.  The dictionaries ship via
    ``SparkContext.broadcast`` — once per executor, not re-pickled into
    every task closure (the difference matters for multi-GB dictionaries).
    """
    bc = texts.sparkSession.sparkContext.broadcast(
        (list(surfaces), dict(predicates or {}))
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern_surfaces, preds = bc.value
        pat = _compile_dictionary(pattern_surfaces)
        cue_pat = _compile_cue_pattern(preds) if preds else None
        for pdf in batches:
            out = {
                k: []
                for k in ("url", "sent_idx", "sent_start", "start", "end", "kind", "token")
            }

            def emit(url, sent_idx, sent_start, s, e, kind, token):
                out["url"].append(url)
                out["sent_idx"].append(sent_idx)
                out["sent_start"].append(sent_start)
                out["start"].append(s)
                out["end"].append(e)
                out["kind"].append(kind)
                out["token"].append(token)

            for url, text in zip(pdf["url"], pdf[text_col]):
                mentions, cues = _scan_doc(text, pat, cue_pat)
                for si, ss, s, e, tok in mentions:
                    emit(url, si, ss, s, e, "mention", tok)
                for si, ss, s, e, w in cues:
                    emit(url, si, ss, s, e, "cue", preds[w])
            yield pd.DataFrame(out)

    return texts.select("url", text_col).mapInPandas(scan, schema=SCAN_SCHEMA)


def scan_pages(
    pages: DataFrame,
    surfaces: List[str],
    predicates: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Fused extract+scan: html bytes -> scan rows in ONE Arrow pass.

    Halves JVM<->Python IPC vs chaining extract_stage and scan_sentences
    (the full text never crosses the Arrow boundary twice) — the right
    shape when the text itself isn't a required output.
    """
    from seq2rel_ds_spark.operators.extract import extract_text_from_html

    bc = pages.sparkSession.sparkContext.broadcast(
        (list(surfaces), dict(predicates or {}))
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern_surfaces, preds = bc.value
        pat = _compile_dictionary(pattern_surfaces)
        cue_pat = _compile_cue_pattern(preds) if preds else None
        for pdf in batches:
            out = {
                k: []
                for k in ("url", "sent_idx", "sent_start", "start", "end", "kind", "token")
            }
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text_from_html(bytes(html))
                mentions, cues = _scan_doc(text, pat, cue_pat)
                for si, ss, s, e, tok in mentions:
                    out["url"].append(url)
                    out["sent_idx"].append(si)
                    out["sent_start"].append(ss)
                    out["start"].append(s)
                    out["end"].append(e)
                    out["kind"].append("mention")
                    out["token"].append(tok)
                for si, ss, s, e, w in cues:
                    out["url"].append(url)
                    out["sent_idx"].append(si)
                    out["sent_start"].append(ss)
                    out["start"].append(s)
                    out["end"].append(e)
                    out["kind"].append("cue")
                    out["token"].append(preds[w])
            yield pd.DataFrame(out)

    return pages.select("url", "html").mapInPandas(scan, schema=SCAN_SCHEMA)


RELATION_SCAN_SCHEMA = (
    "url string, sent_idx int, subj_uid string, pred string, obj_uid string"
)


def make_relation_processor(
    dict_rows: List[tuple], predicates: Dict[str, str], ascii_boundaries: bool = False
):
    """Per-batch relation-scan body shared by BOTH scan paths (JVM parquet ->
    mapInPandas, and the Arrow-native pyarrow source): pandas frame of
    (url, html) -> iterator of relation frames.  Compiled state (dictionary,
    patterns) is built once per call — callers construct the processor once
    per task/partition, not per batch."""
    from seq2rel_ds_spark.core.link import (
        build_dictionary,
        make_doc_linker,
        select_relations,
    )
    from seq2rel_ds_spark.operators.extract import extract_text_from_html

    dictionary = build_dictionary(dict_rows)
    pat = _compile_dictionary(list(dictionary), ascii_boundaries=ascii_boundaries)
    preds = dict(predicates)
    cue_pat = _compile_cue_pattern(preds, ascii_boundaries=ascii_boundaries)
    link_doc = make_doc_linker(dictionary)

    def process(pdf: pd.DataFrame):
        out = {k: [] for k in ("url", "sent_idx", "subj_uid", "pred", "obj_uid")}
        for url, html in zip(pdf["url"], pdf["html"]):
            text = extract_text_from_html(bytes(html))
            raw_mentions, raw_cues = _scan_doc(text, pat, cue_pat)
            mentions = [(si, s, e, tok) for si, _ss, s, e, tok in raw_mentions]
            cues = [(si, s, preds[w]) for si, _ss, s, _e, w in raw_cues]
            linked = link_doc(mentions)
            for sent_idx, subj, pred, obj in select_relations(linked, cues):
                out["url"].append(url)
                out["sent_idx"].append(sent_idx)
                out["subj_uid"].append(subj)
                out["pred"].append(pred)
                out["obj_uid"].append(obj)
        yield pd.DataFrame(out)

    return process


TRIPLE_PARTIAL_SCHEMA = "subj_uid string, pred string, obj_uid string, cnt long"


def make_triple_partial_processor(
    dict_rows: List[tuple], predicates: Dict[str, str], ascii_boundaries: bool = False
):
    """Like ``make_relation_processor`` but with MAP-SIDE COMBINE fused into
    the scan task: each batch emits per-(subj, pred, obj) partial COUNTS
    instead of one row per relation instance.

    Why this is the 100 TB shape: the doc-local scan produces ~17 relation
    instances per page but only ever |distinct triples seen by the task|
    distinct keys, so aggregating inside the Python task bounds what crosses
    the Arrow IPC boundary AND what the JVM has to hash at
    O(distinct-per-task), not O(instances) — the same bound the salted
    two-phase aggregate provides, obtained one stage earlier.  Canonical ids
    and the global merge stay in Catalyst (``canonicalize_from_partials``).
    Parity with the instance-row path is pinned by
    tests/operators/test_fused_scan.py (identical triples AND n_support).

    The loop is direct (no per-instance rows, no intermediate frame): cue
    scan first — a document with no predicate cue can emit no relation, so
    the heavier dictionary scan and the linker are skipped for it — then
    mentions in link-ready form, counts accumulated in place.  ~15%
    measured over wrapping the instance-row processor.
    """
    from collections import Counter

    from seq2rel_ds_spark.core.link import (
        build_dictionary,
        make_doc_linker,
        select_relations,
    )
    from seq2rel_ds_spark.operators.extract import extract_text_from_html

    dictionary = build_dictionary(dict_rows)
    pat = _compile_dictionary(list(dictionary), ascii_boundaries=ascii_boundaries)
    preds = dict(predicates)
    cue_scan = _make_cue_scanner(preds, ascii_boundaries)
    link_doc = make_doc_linker(dictionary)

    def process(pdf: pd.DataFrame):
        counts: Counter = Counter()
        for html in pdf["html"]:
            text = extract_text_from_html(bytes(html))
            # cue scan FIRST: a cue-free doc can emit nothing, so the
            # sentence-bound regex and the dictionary scan are skipped
            # entirely for it (the cue scan is the cheapest of the three).
            # Neutral on the synthetic bench corpus (0 cue-free docs) —
            # the win is on real webtext, where most pages mention no
            # relation cue at all.  Counter.update over a generator was
            # also tried for the per-instance count loop and REJECTED:
            # measured ~0.85x (generator frame per instance beats the
            # plain loop's C-level dict __setitem__ in the wrong
            # direction).
            hits = cue_scan(text)
            if not hits:
                continue
            bounds = _sent_bounds(text)
            cues = [(bisect_right(bounds, s), s, preds[w]) for s, w in hits]
            mentions = []
            ap = mentions.append
            for m in pat.finditer(text):
                s, e = m.span()
                ap((bisect_right(bounds, s), s, e, m.group(0)))
            linked = link_doc(mentions)
            for _sent, subj, pred, obj in select_relations(linked, cues):
                counts[(subj, pred, obj)] += 1
        keys = list(counts)
        yield pd.DataFrame(
            {
                "subj_uid": [k[0] for k in keys],
                "pred": [k[1] for k in keys],
                "obj_uid": [k[2] for k in keys],
                "cnt": [counts[k] for k in keys],
            }
        )

    return process


def fused_triple_partials(
    pages: DataFrame,
    dictionary_rows: List[tuple],
    predicates: Dict[str, str],
    ascii_boundaries: bool = False,
) -> DataFrame:
    """JVM-scan variant of the fused-combine flagship stage: parquet scan ->
    ONE Arrow pass doing extract+scan+link+select+partial-aggregate.  Output
    rows are (subj_uid, pred, obj_uid, cnt) partials; feed to
    ``canonicalize_from_partials``."""
    bc = pages.sparkSession.sparkContext.broadcast(
        (list(dictionary_rows), dict(predicates), bool(ascii_boundaries))
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dict_rows, preds, ascii_b = bc.value
        process = make_triple_partial_processor(dict_rows, preds, ascii_boundaries=ascii_b)
        for pdf in batches:
            yield from process(pdf)

    return pages.select("html").mapInPandas(scan, schema=TRIPLE_PARTIAL_SCHEMA)


def fused_triple_partials_arrow(
    spark,
    pages_path: str,
    dictionary_rows: List[tuple],
    predicates: Dict[str, str],
    ascii_boundaries: bool = False,
    batch_size: int = 20000,
) -> DataFrame:
    """Arrow-native + fused-combine flagship stage (the bench default):
    python workers read their (file, row_group) splits directly with pyarrow
    (one decode, no inbound IPC — sources/arrow_pages.py) and emit
    pre-aggregated triple partials (no per-instance outbound IPC either).
    The JVM's remaining work is scheduling plus a final merge over
    O(distinct-triples x tasks) skinny rows."""
    from seq2rel_ds_spark.sources.arrow_pages import scan_parquet_python

    bc = spark.sparkContext.broadcast(
        (list(dictionary_rows), dict(predicates), bool(ascii_boundaries))
    )

    state: dict = {}  # one compiled processor per worker process

    def process(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        if "proc" not in state:
            dict_rows, preds, ascii_b = bc.value
            state["proc"] = make_triple_partial_processor(
                dict_rows, preds, ascii_boundaries=ascii_b
            )
        yield from state["proc"](pdf)

    return scan_parquet_python(
        spark,
        pages_path,
        process,
        schema=TRIPLE_PARTIAL_SCHEMA,
        columns=["html"],  # url never reaches the combine — prune at the reader
        batch_size=batch_size,
    )


def fused_relation_scan(
    pages: DataFrame,
    dictionary_rows: List[tuple],
    predicates: Dict[str, str],
    ascii_boundaries: bool = False,
) -> DataFrame:
    """The whole doc-local half of the KG pipeline in ONE Arrow pass:
    html -> text -> sentence scan -> dictionary+coherence linking ->
    per-cue subject/object selection -> relation rows.

    Nothing here needs cross-document state, so no byte of text or mention
    ever crosses a shuffle; the only shuffle left in the flagship plan is
    the salted canonical aggregation downstream.  Semantics are the pure
    functions in core.link — identical to the modular Catalyst operators,
    pinned by tests.

    ``dictionary_rows``: (surface, uid, label, is_canonical) tuples —
    shipped via ``SparkContext.broadcast`` (once per executor; the task
    closure carries only the broadcast handle).
    """
    from seq2rel_ds_spark.core.link import (
        build_dictionary,
        link_doc_mentions,
        select_relations,
    )
    from seq2rel_ds_spark.operators.extract import extract_text_from_html

    bc = pages.sparkSession.sparkContext.broadcast(
        (list(dictionary_rows), dict(predicates), bool(ascii_boundaries))
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dict_rows, preds, ascii_b = bc.value
        process = make_relation_processor(dict_rows, preds, ascii_boundaries=ascii_b)
        for pdf in batches:
            yield from process(pdf)

    return pages.select("url", "html").mapInPandas(scan, schema=RELATION_SCAN_SCHEMA)


def fused_relation_scan_arrow(
    spark,
    pages_path: str,
    dictionary_rows: List[tuple],
    predicates: Dict[str, str],
    ascii_boundaries: bool = False,
    batch_size: int = 20000,
) -> DataFrame:
    """The flagship scan over the Arrow-native parquet source: Python
    workers read their (file, row_group) splits directly with pyarrow —
    one decode, no JVM->Python IPC for the html bytes.  Identical output to
    ``fused_relation_scan`` over the same files (parity-tested); see
    sources/arrow_pages.py for when this path wins and what it gives up."""
    from seq2rel_ds_spark.sources.arrow_pages import scan_parquet_python

    bc = spark.sparkContext.broadcast(
        (list(dictionary_rows), dict(predicates), bool(ascii_boundaries))
    )

    state: dict = {}  # one compiled processor per worker process

    def process(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        if "proc" not in state:
            dict_rows, preds, ascii_b = bc.value
            state["proc"] = make_relation_processor(
                dict_rows, preds, ascii_boundaries=ascii_b
            )
        yield from state["proc"](pdf)

    return scan_parquet_python(
        spark,
        pages_path,
        process,
        schema=RELATION_SCAN_SCHEMA,
        columns=["url", "html"],
        batch_size=batch_size,
    )


def detect_mentions(texts: DataFrame, surfaces: List[str], text_col: str = "text") -> DataFrame:
    """Mention rows only (back-compat surface of the scanner)."""
    scans = scan_sentences(texts, surfaces, predicates=None, text_col=text_col)
    return scans.filter(F.col("kind") == "mention").select(
        "url", "sent_idx", "sent_start", "start", "end", F.col("token").alias("surface")
    )


def cue_rows(scans: DataFrame) -> DataFrame:
    """Predicate-cue rows from a scan (url, sent_idx, cue_pos, pred)."""
    return scans.filter(F.col("kind") == "cue").select(
        "url",
        "sent_idx",
        F.col("start").alias("cue_pos"),
        F.col("token").alias("pred"),
    )


def mention_rows(scans: DataFrame) -> DataFrame:
    return scans.filter(F.col("kind") == "mention").select(
        "url", "sent_idx", "sent_start", "start", "end", F.col("token").alias("surface")
    )


def link_mentions(
    mentions: DataFrame, dictionary: DataFrame, texts: DataFrame = None
) -> DataFrame:
    """Dictionary + context entity linking.

    Broadcast-join mentions to candidate uids on surface; ambiguous surfaces
    (one surface, many uids) resolve by a deterministic context score — a
    label-coherence prior (count of mentions in the same document sharing the
    candidate's label) — with (score desc, canonical first, uid asc)
    tie-break.  All Catalyst: one broadcast join + two windows over the same
    url partitioning; no Python, no extra shuffle for the score.
    """
    from pyspark.sql import Window

    cands = mentions.join(F.broadcast(dictionary), "surface", "inner")
    # one exchange on url serves BOTH windows below: hash(url) satisfies the
    # clustering needs of (url,label) and (url,start,end) alike, so Catalyst
    # inserts no further shuffles (vs two back-to-back exchanges otherwise)
    cands = cands.repartition("url")
    label_w = Window.partitionBy("url", "label")
    scored = cands.withColumn("label_hits", F.count("*").over(label_w))
    pick_w = Window.partitionBy("url", "start", "end").orderBy(
        F.desc("label_hits"), F.desc("is_canonical"), F.asc("uid")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(pick_w))
        .filter(F.col("rnk") == 1)
        .select("url", "sent_idx", "sent_start", "start", "end", "surface", "uid", "label")
    )
