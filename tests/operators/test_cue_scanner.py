"""Equivalence of the find()-based cue scanner with the \\b-regex scanner
(the fast path used inside the flagship's fused processors)."""

from seq2rel_ds_spark.operators.mention import (
    _compile_cue_pattern,
    _make_cue_scanner,
)


def _regex_scan(preds, ascii_boundaries, text):
    pat = _compile_cue_pattern(preds, ascii_boundaries=ascii_boundaries)
    return [(c.start(), c.group(0)) for c in pat.finditer(text)]


TEXTS = [
    "",
    "treats",
    "x treats y causes z.",
    "pretreats treats treatsx treats.",          # \b edges
    "treat treats treated treats",               # prefix-overlap words
    "causes causes causes",                      # repeats
    "a.treats,causes;treats?end",                # punctuation boundaries
    "TREATS treats Treats",                      # case sensitivity
    "word_treats treats_word treats",            # underscore is a word char
    "9treats treats9 treats",                    # digits are word chars
]


def test_fast_path_matches_regex():
    preds = {"treats": "TREATS", "causes": "CAUSES", "treat": "TREAT"}
    scan = _make_cue_scanner(preds, True)
    assert scan.__name__ == "scan_find"
    for t in TEXTS:
        assert scan(t) == _regex_scan(preds, True, t), t


def test_non_word_cues_fall_back_to_regex():
    preds = {"linked to": "LINKED", "co-occurs": "COOCCURS"}
    scan = _make_cue_scanner(preds, True)
    assert scan.__name__ == "scan_regex"
    t = "a linked to b, co-occurs with c; linked tox."
    assert scan(t) == _regex_scan(preds, True, t)


def test_unicode_boundaries_fall_back():
    scan = _make_cue_scanner({"treats": "TREATS"}, False)
    assert scan.__name__ == "scan_regex"
