"""Deterministic synthetic fixtures exercising every reference edge case.

Content is original (not copied from the reference's test_fixtures); the
*shapes* mirror FIXTURES.md: PubTator/CDR blocks, GDA triples of files,
DocRED JSON, DGM JSONL.  Edge cases covered (FIXTURES.md §1):

  * ungrounded uid ``-1`` (dropped)
  * duplicate mentions of one uid (case-insensitive dedup)
  * mentions in title vs abstract (section filter)
  * compound entity (7-column line) with re-anchorable members
  * malformed mention line (missing uid column)
  * relation referencing an unknown uid (silently dropped)
  * duplicate relation line (dedup-on-insert)
  * a document with a title but no abstract
  * n-ary (3-entity) relation
  * two relations sharing entities but with different labels (order pin)
"""

from __future__ import annotations

# --- CDR-shaped PubTator corpus ------------------------------------------

# Doc 101: the full battery of mention edge cases.
_DOC_101_TITLE = "Zelapra causes mild visual fog in trial patients."
_DOC_101_ABSTRACT = (
    "Patients receiving zelapra and morphadol reported visual fog within days. "
    "The compound zelapra / morphadol mixture amplified Visual Fog episodes, "
    "while plain saline produced no effect."
)

# title length = 49. Offsets are document-level over "title abstract".
_DOC_101 = "\n".join(
    [
        "101|t|" + _DOC_101_TITLE,
        "101|a|" + _DOC_101_ABSTRACT,
        # simple title mention
        "101\t0\t7\tZelapra\tChemical\tC001",
        # title mention of the disease
        "101\t20\t30\tvisual fog\tDisease\tD900",
        # abstract mentions (duplicate surface, different case -> dedup)
        "101\t69\t76\tzelapra\tChemical\tC001",
        "101\t81\t90\tmorphadol\tChemical\tC002",
        "101\t100\t110\tvisual fog\tDisease\tD900",
        # compound entity: 7-column form, members re-anchored within span
        "101\t137\t164\tzelapra / morphadol mixture\tChemical\tC001|C002\tzelapra|morphadol",
        # later Mixed-case mention of the disease (dedup case-insensitive)
        "101\t175\t185\tVisual Fog\tDisease\tD900",
        # ungrounded mention: dropped
        "101\t208\t214\tsaline\tChemical\t-1",
        # relations: two positives, one duplicate, one referencing unknown uid
        "101\tCID\tC001\tD900",
        "101\tCID\tC002\tD900",
        "101\tCID\tC001\tD900",
        "101\tCID\tC999\tD900",
    ]
)

# Doc 102: title-only document (no abstract text after |a|).
_DOC_102 = "\n".join(
    [
        "102|t|Brivatol linked to ear ringing in small cohort.",
        "102|a|",
        "102\t0\t8\tBrivatol\tChemical\tC010",
        "102\t19\t30\tear ringing\tDisease\tD910",
        "102\tCID\tC010\tD910",
    ]
)

# Doc 103: no relations at all (empty linearization target).
_DOC_103 = "\n".join(
    [
        "103|t|Plain water shows no adverse events.",
        "103|a|A control study of plain water found nothing of note.",
        "103\t6\t11\twater\tChemical\tC020",
    ]
)

CDR_CORPUS = "\n\n".join([_DOC_101, _DOC_102, _DOC_103])

# A malformed corpus: one mention line missing its uid column.
MALFORMED_CORPUS = "\n".join(
    [
        "201|t|Qorvex tied to night sweats.",
        "201|a|Qorvex patients reported night sweats frequently.",
        "201\t0\t6\tQorvex\tChemical\tC030",
        "201\t15\t27\tnight sweats\tDisease",  # 5 cols -> malformed
        "201\tCID\tC030\tD930",
    ]
)

# MeSH-style tree for hypernym tests: D950 is an ancestor of D951.
MESH_TREE = {
    "D950": ["F01.100"],
    "D951": ["F01.100.200"],
    "D900": ["G02.300"],
}

# Hypernym corpus: positive (C040, D951); negative candidate (C040, D950)
# must be filtered because D950's tree number is a prefix of D951's.
HYPERNYM_CORPUS = "\n".join(
    [
        "301|t|Veloxin induces sharp chest spasm events.",
        "301|a|Several subjects on veloxin developed chest spasm and broader chest discomfort.",
        "301\t0\t7\tVeloxin\tChemical\tC040",
        "301\t22\t33\tchest spasm\tDisease\tD951",
        "301\t104\t120\tchest discomfort\tDisease\tD950",
        "301\tCID\tC040\tD951",
    ]
)

# n-ary (DGM-like 3-entity) relation expressed directly in PubTator shape.
NARY_CORPUS = "\n".join(
    [
        "401|t|",
        "401|a|Dastinex paired with kinase gef44 variant m77x slowed growth.",
        "401\t0\t8\tDastinex\tdrug\tdastinex",
        "401\t28\t33\tgef44\tgene\tgef44",
        "401\t42\t46\tm77x\tvariant\tm77x",
        "401\tDGM\tdastinex\tgef44\tm77x",
    ]
)

# Two relations over the same entity pair with different labels (DocRED-style
# ordering pin, mirrors the reference's test_docred ordering case).
SAME_PAIR_TWO_LABELS_CORPUS = "\n".join(
    [
        "501|t|",
        "501|a|Harbor City sits inside Western County near the old coast road.",
        "501\t0\t11\tHarbor City\tLOC\t0",
        "501\t24\t38\tWestern County\tLOC\t1",
        "501\tLOCATED_IN\t0\t1",
        "501\tCONTAINS\t1\t0",
    ]
)


# --- GDA shape (abstracts / anns / labels.csv) -----------------------------

GDA_ABSTRACTS = "\n\n".join(
    [
        "9001\nGene tafA drives mild skin rash.\nCarriers of tafA variants showed skin rash more often.",
        # title-only article (abstract line optional, gda.py:44-46)
        "9002\nLoss of borC linked to night blindness.",
    ]
)

GDA_ANNS = "\n\n".join(
    [
        "\n".join(
            [
                "9001\t5\t9\ttafA\tGene\tG100",
                "9001\t21\t30\tskin rash\tDisease\tD200",
                # unsorted on purpose (anns.txt arrives unsorted)
                "9001\t45\t49\ttafA\tGene\tG100",
            ]
        ),
        "\n".join(
            [
                "9002\t8\t12\tborC\tGene\tG101",
                "9002\t23\t38\tnight blindness\tDisease\tD201",
            ]
        ),
    ]
)

GDA_LABELS = "\n".join(
    [
        "pmid,geneId,diseaseId,label",
        "9001,G100,D200,1",
        "9002,G101,D201,1",
    ]
)

# --- DocRED shape -----------------------------------------------------------

DOCRED_EXAMPLES = [
    {
        "sents": [
            ["Mistral", "Bay", "lies", "within", "Coral", "Province", "."],
            ["The", "bay", "hosts", "Mistral", "Harbor", "."],
        ],
        "vertexSet": [
            [
                {"name": "Mistral Bay", "pos": [0, 2], "sent_id": 0, "type": "LOC"},
                # mention in a second sentence (prefix-sum offset case)
                {"name": "Mistral Harbor", "pos": [3, 5], "sent_id": 1, "type": "LOC"},
            ],
            [{"name": "Coral Province", "pos": [4, 6], "sent_id": 0, "type": "LOC"}],
        ],
        "labels": [{"r": "P131", "h": 0, "t": 1}],
    },
    # a document with no labels -> empty relation string output
    {
        "sents": [["Quiet", "village", "with", "no", "claims", "."]],
        "vertexSet": [
            [{"name": "Quiet village", "pos": [0, 2], "sent_id": 0, "type": "LOC"}]
        ],
        "labels": [],
    },
    # two relations sharing both entities, different labels (ordering pin)
    {
        "sents": [["Arlen", "Keep", "guards", "Dunmore", "Pass", "."]],
        "vertexSet": [
            [{"name": "Arlen Keep", "pos": [0, 2], "sent_id": 0, "type": "LOC"}],
            [{"name": "Dunmore Pass", "pos": [3, 5], "sent_id": 0, "type": "LOC"}],
        ],
        "labels": [
            {"r": "P131", "h": 0, "t": 1},
            {"r": "P47", "h": 0, "t": 1},
        ],
    },
]

DOCRED_TYPES = {
    "relations": {
        "P131": {"verbose": "located in the administrative territorial entity"},
        "P47": {"verbose": "shares border with, sometimes"},
    }
}

# --- DGM shape (JSONL, token spans, 3-ary candidates) -----------------------

DGM_EXAMPLES = [
    {
        "pmid": "7001",
        "paragraphs": [
            ["tivo", "zane", "blocks", "kinase", "raf9", "in", "cells", "."],
            ["the", "m12v", "variant", "resists", "tivo", "zane", "."],
        ],
        "mentions": [
            [
                {"start": 0, "end": 2, "type": "drug", "name": "tivozane"},
                {"start": 4, "end": 5, "type": "gene", "name": "raf9"},
            ],
            [
                {"start": 1, "end": 2, "type": "variant", "name": "m12v"},
                {"start": 4, "end": 6, "type": "drug", "name": "tivozane"},
            ],
        ],
        "triple_candidates": [
            {"drug": "tivozane", "gene": "raf9", "variant": "m12v", "label": 1},
            {"drug": "tivozane", "gene": "raf9", "variant": "m12v", "label": 0},
        ],
    },
    # empty candidates -> example dropped entirely
    {
        "pmid": "7002",
        "paragraphs": [["nothing", "here", "."]],
        "mentions": [[]],
        "triple_candidates": [],
    },
    # overlapping occurrences: "ata ata" contains "ata" -> findall case via
    # a mention text that repeats in the abstract
    {
        "pmid": "7003",
        "paragraphs": [["drugx", "helps", ".", "drugx", "binds", "geney", "."]],
        "mentions": [
            [
                {"start": 0, "end": 1, "type": "drug", "name": "drugx"},
                {"start": 5, "end": 6, "type": "gene", "name": "geney"},
            ]
        ],
        "triple_candidates": [
            {"drug": "drugx", "gene": "geney", "variant": "v1v", "label": 1}
        ],
    },
]


def all_fixture_corpora() -> dict:
    return {
        "cdr": CDR_CORPUS,
        "malformed": MALFORMED_CORPUS,
        "hypernym": HYPERNYM_CORPUS,
        "nary": NARY_CORPUS,
        "same_pair": SAME_PAIR_TWO_LABELS_CORPUS,
    }
