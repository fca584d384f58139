"""Unit + property tests for the text primitives (reference parity)."""

from hypothesis import given
from hypothesis import strategies as st

from seq2rel_ds_spark.core.text import (
    bounded_word_search,
    normalize_ws,
    overlapping_positions,
)


class TestNormalizeWs:
    def test_collapses_all_whitespace(self):
        assert normalize_ws(" a\tb\n c   d ") == "a b c d"

    def test_lowercase(self):
        assert normalize_ws("  A \t B", lowercase=True) == "a b"

    def test_empty(self):
        assert normalize_ws("   \t\n ") == ""

    @given(st.text())
    def test_matches_join_split_contract(self, s):
        # the reference's exact contract: " ".join(text.strip().split())
        assert normalize_ws(s) == " ".join(s.strip().split())

    @given(st.text())
    def test_idempotent(self, s):
        once = normalize_ws(s)
        assert normalize_ws(once) == once


class TestOverlappingPositions:
    def test_overlapping(self):
        assert overlapping_positions("GATATATGCATATACTT", "ATAT") == [1, 3, 9]

    def test_absent(self):
        assert overlapping_positions("abc", "zz") == []

    def test_empty_needle(self):
        assert overlapping_positions("abc", "") == []

    @given(st.text(alphabet="ab", max_size=30), st.text(alphabet="ab", min_size=1, max_size=4))
    def test_every_position_is_a_real_occurrence(self, hay, needle):
        for pos in overlapping_positions(hay, needle):
            assert hay[pos : pos + len(needle)] == needle


class TestBoundedWordSearch:
    TEXT = "met gala over metformin and meta analysis of metformin therapy"

    def test_whole_word_only(self):
        # "met" must not match inside "metformin"
        assert bounded_word_search("met", self.TEXT) == (0, 3)

    def test_bounded_region(self):
        lo = self.TEXT.index("and")
        assert bounded_word_search("metformin", self.TEXT, lo=lo) == (45, 54)

    def test_backoff_first_last(self):
        # exact phrase absent -> lazy first..last match
        text = "alpha beta gamma delta"
        assert bounded_word_search("alpha delta", text) == (0, len(text))

    def test_single_token_no_backoff(self):
        assert bounded_word_search("zzz", self.TEXT) is None

    def test_endpos_excludes(self):
        assert bounded_word_search("metformin", self.TEXT, lo=0, hi=10) is None


class TestReferenceDifferential:
    """Differential checks against the reference implementation itself."""

    def test_sanitize_parity(self, reference):
        import seq2rel_ds.common.text_utils as ref_text

        cases = [" a\tb\n c ", "", "  X  Y  ", "a b", "Mixed CASE\t"]
        for s in cases:
            assert normalize_ws(s) == ref_text.sanitize_text(s)
            assert normalize_ws(s, lowercase=True) == ref_text.sanitize_text(s, lowercase=True)

    def test_findall_parity(self, reference):
        import seq2rel_ds.common.text_utils as ref_text

        for hay, needle in [("GATATATGCATATACTT", "ATAT"), ("aaaa", "aa"), ("abc", "d")]:
            assert overlapping_positions(hay, needle) == list(ref_text.findall(hay, needle))

    def test_first_mention_parity(self, reference):
        from seq2rel_ds.common.util import _find_first_mention

        cases = [
            ("met", self_text := TestBoundedWordSearch.TEXT, {}),
            ("metformin", self_text, {"pos": 10}),
            ("alpha delta", "alpha beta gamma delta", {}),
            ("absent phrase", "alpha beta", {}),
            ("metformin", self_text, {"pos": 0, "endpos": 10}),
        ]
        for needle, text, kw in cases:
            ref_match = _find_first_mention(needle, text, **kw)
            mine = bounded_word_search(
                needle, text, lo=kw.get("pos", 0), hi=kw.get("endpos")
            )
            assert mine == (ref_match.span() if ref_match else None)
