"""The trie-compressed dictionary matcher must be match-identical to the
flat longest-first alternation it replaced (operators/mention.py:36) —
including prefix-comparable surfaces, regex metacharacters, and
multi-token surfaces.  Pure Python, no Spark session needed."""

import re

from seq2rel_ds_spark.operators.mention import _compile_dictionary


def _flat(surfaces):
    ordered = sorted(set(surfaces), key=lambda s: (-len(s), s))
    return re.compile(r"\b(" + "|".join(re.escape(s) for s in ordered) + r")\b")


SURFACES = [
    "abc",
    "abcd",          # prefix pair: longest must win
    "abc def",       # multi-token sharing a prefix with abc
    "ab",
    "a+b",           # regex metachar
    "x.y",           # dot must stay literal
    "zeta-9",        # hyphenated alias
    "zeta",
    "qq",
]

TEXTS = [
    "abc and abcd then abc def end",
    "ab abc abcd ab",
    "a+b meets x.y and xay",     # xay must NOT match the literal x.y
    "zeta-9 or zeta alone",
    "qqq qq q",                   # \b semantics around repeated letters
    "",
    "abcd" * 50 + " abc def",
]


class TestTrieDictionaryRegex:
    def test_match_identical_to_flat_alternation(self):
        trie = _compile_dictionary(SURFACES)
        flat = _flat(SURFACES)
        for text in TEXTS:
            got = [(m.start(), m.end(), m.group(0)) for m in trie.finditer(text)]
            want = [(m.start(), m.end(), m.group(0)) for m in flat.finditer(text)]
            assert got == want, text

    def test_longest_dictionary_match_wins(self):
        trie = _compile_dictionary(["ab", "abc", "abcd"])
        assert [m.group(0) for m in trie.finditer("abcd abc ab")] == [
            "abcd",
            "abc",
            "ab",
        ]

    def test_property_equivalence_random_dictionaries(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from seq2rel_ds_spark.operators.mention import _SENT_SPLIT

        alphabet = "ab .-+x"
        # surfaces containing a sentence boundary are a rejected input class
        # now (enforced precondition of the single-pass scanner) — the
        # equivalence property quantifies over the accepted domain
        word = st.text(alphabet=alphabet, min_size=1, max_size=6).filter(
            lambda s: not _SENT_SPLIT.search(s)
        )

        @settings(max_examples=200, deadline=None)
        @given(
            st.sets(word, min_size=1, max_size=10),
            st.text(alphabet=alphabet, max_size=60),
        )
        def check(surfaces, text):
            trie = _compile_dictionary(sorted(surfaces))
            flat = _flat(sorted(surfaces))
            got = [(m.start(), m.end()) for m in trie.finditer(text)]
            want = [(m.start(), m.end()) for m in flat.finditer(text)]
            assert got == want

        check()


class TestBoundaryValidation:
    def test_surface_with_sentence_boundary_rejected(self):
        import pytest

        from seq2rel_ds_spark.operators.mention import (
            _compile_cue_pattern,
            _compile_dictionary,
        )

        with pytest.raises(ValueError, match="sentence boundary"):
            _compile_dictionary(["U.S. Army"])
        with pytest.raises(ValueError, match="sentence boundary"):
            _compile_cue_pattern(["causes. badly"])
        # a dot NOT followed by whitespace is fine (no split can occur there)
        _compile_dictionary(["node.js"])
