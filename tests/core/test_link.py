"""Hybrid doc-linker parity: make_doc_linker must be row-identical to
link_doc_mentions on every dictionary shape — unambiguous-only (fast path),
ambiguous present-in-dict-but-absent-in-doc (fast path must NOT fall back
semantically wrong), and ambiguous-in-doc (full coherence fallback).

Reference semantics: /root/reference/seq2rel_ds/common/util.py (cluster
resolution picks one id per mention); the coherence scorer itself is this
repo's Catalyst-twin contract (core/link.py module docstring).
"""

import random

from seq2rel_ds_spark.core.link import (
    build_dictionary,
    link_doc_mentions,
    make_doc_linker,
    select_relations,
)


def _random_case(rng: random.Random):
    surfaces = [f"surf{i}" for i in range(rng.randint(1, 12))]
    rows = []
    for i, s in enumerate(surfaces):
        n_cands = rng.choice([1, 1, 1, 2, 3])  # mostly unambiguous
        for j in range(n_cands):
            rows.append(
                (
                    s,
                    f"U{i}_{j}",
                    rng.choice(["DRUG", "DISEASE", "GENE"]),
                    j == 0 if rng.random() < 0.8 else rng.random() < 0.5,
                )
            )
    d = build_dictionary(rows)
    mentions = []
    pos = 0
    for _ in range(rng.randint(0, 20)):
        s = rng.choice(surfaces + ["unknown_surface"])
        start = pos + rng.randint(0, 3)
        end = start + max(len(s), 1)
        mentions.append((rng.randint(0, 4), start, end, s))
        pos = end
    return d, mentions


def test_hybrid_linker_parity():
    rng = random.Random(20260817)
    fell_back = fast_only = 0
    for _ in range(300):
        d, mentions = _random_case(rng)
        link = make_doc_linker(d)
        expect = link_doc_mentions(mentions, d)
        got = link(mentions)
        assert got == expect
        if any(len(d.get(m[3], ())) > 1 for m in mentions):
            fell_back += 1
        else:
            fast_only += 1
    # both paths must actually have been exercised by the generator
    assert fell_back > 20 and fast_only > 20


def test_hybrid_fast_path_with_ambiguity_elsewhere_in_dict():
    # ambiguous surface EXISTS in the dictionary but not in this doc: the
    # fast path applies and must equal full coherence scoring
    d = build_dictionary(
        [
            ("vexal", "DRUG1", "DRUG", True),
            ("vexal", "GENE9", "GENE", True),
            ("cardiosis", "DIS1", "DISEASE", True),
        ]
    )
    mentions = [(0, 0, 9, "cardiosis"), (1, 12, 21, "cardiosis")]
    assert make_doc_linker(d)(mentions) == link_doc_mentions(mentions, d)


def test_hybrid_fallback_trigger():
    # one ambiguous mention flips the whole doc to full scoring: the second
    # DRUG mention must still win the coherence vote for "vexal"
    d = build_dictionary(
        [
            ("vexal", "DRUG1", "DRUG", True),
            ("vexal", "GENE9", "GENE", True),
            ("vexanib", "DRUG1", "DRUG", False),
        ]
    )
    mentions = [(0, 0, 5, "vexal"), (1, 10, 17, "vexanib")]
    linked = make_doc_linker(d)(mentions)
    assert linked == link_doc_mentions(mentions, d)
    assert linked[0][4] == "DRUG1"


def test_select_relations_span_over_cue_excluded():
    # a mention spanning the cue position (start <= cue < end) is neither
    # subject nor object under the max_by/min_by contract; the single-pass
    # rewrite must preserve that
    linked = [
        (0, 0, 5, "a", "U_SUBJ", "DRUG"),
        (0, 8, 14, "b", "U_SPAN", "DRUG"),  # spans cue_pos=10
        (0, 16, 20, "c", "U_OBJ", "DISEASE"),
    ]
    assert select_relations(linked, [(0, 10, "CAUSES")]) == [
        (0, "U_SUBJ", "CAUSES", "U_OBJ")
    ]
