"""Parse + linearize parity of the pure semantic core vs the reference."""

import pytest

from seq2rel_ds_spark.core import pubtator
from seq2rel_ds_spark.core.hypernym import filter_hypernyms
from tests.fixtures import synth


def _reference_lines(reference, content, text_segment="both", **kw):
    anns = reference.util.parse_pubtator(
        pubtator_content=content,
        text_segment=reference.util.TextSegment(text_segment),
        **kw,
    )
    return anns, reference.util.pubtator_to_seq2rel(anns)


class TestParseBlock:
    def test_basic_shape(self):
        docs = pubtator.parse_corpus(synth.CDR_CORPUS)
        assert [d.doc_id for d in docs] == ["101", "102", "103"]
        d = docs[0]
        # C999 relation dropped (unknown uid), duplicate dropped
        assert d.relations == [
            (("C001", "D900"), "CID"),
            (("C002", "D900"), "CID"),
        ]
        # ungrounded saline dropped; three grounded clusters
        assert [c.uid for c in d.clusters] == ["C001", "D900", "C002"]

    def test_compound_reanchor(self):
        d = pubtator.parse_corpus(synth.CDR_CORPUS)[0]
        c2 = d.cluster_map()["C002"]
        # compound member "morphadol" re-anchored inside (137,164)
        spans = [(m.start, m.end) for m in c2.members]
        assert (147, 156) in spans

    def test_malformed_raises_and_skips(self):
        with pytest.raises(ValueError):
            pubtator.parse_corpus(synth.MALFORMED_CORPUS)
        docs = pubtator.parse_corpus(synth.MALFORMED_CORPUS, skip_malformed=True)
        # D930 never became an entity -> its relation is dropped
        assert docs[0].relations == []

    def test_title_only_doc(self):
        d = pubtator.parse_corpus(synth.CDR_CORPUS)[1]
        assert d.text == "Brivatol linked to ear ringing in small cohort."
        assert d.relations == [(("C010", "D910"), "CID")]

    def test_segment_title_filters_abstract_mentions(self):
        docs = pubtator.parse_corpus(synth.CDR_CORPUS, text_segment="title")
        d = docs[0]
        # only title mentions survive -> C002 gone -> its relation gone
        assert set(d.cluster_map()) == {"C001", "D900"}
        assert d.relations == [(("C001", "D900"), "CID")]


class TestLinearizeCore:
    def test_doc101_linearization(self):
        d = pubtator.parse_corpus(synth.CDR_CORPUS)[0]
        assert d.to_string() == (
            "zelapra @CHEMICAL@ visual fog @DISEASE@ @CID@ "
            "morphadol @CHEMICAL@ visual fog @DISEASE@ @CID@"
        )

    def test_nary_relation(self):
        d = pubtator.parse_corpus(synth.NARY_CORPUS, text_segment="abstract")[0]
        assert d.to_string() == (
            "dastinex @DRUG@ gef44 @GENE@ m77x @VARIANT@ @DGM@"
        )

    def test_same_pair_two_labels_order(self):
        d = pubtator.parse_corpus(
            synth.SAME_PAIR_TWO_LABELS_CORPUS, text_segment="abstract"
        )[0]
        # LOCATED_IN (head offset 11) sorts before CONTAINS (head offset 62)
        assert d.to_string() == (
            "harbor city @LOC@ western county @LOC@ @LOCATED_IN@ "
            "western county @LOC@ harbor city @LOC@ @CONTAINS@"
        )

    def test_hints(self):
        d = pubtator.parse_corpus(synth.CDR_CORPUS)[0]
        hinted = d.hinted_text()
        assert hinted.startswith(
            "zelapra @CHEMICAL@ visual fog @DISEASE@ morphadol @CHEMICAL@ [SEP] "
        )

    def test_empty_relations_empty_string(self):
        d = pubtator.parse_corpus(synth.CDR_CORPUS)[2]
        assert d.to_string() == ""


class TestHypernymCore:
    def test_filter(self):
        docs = pubtator.parse_corpus(synth.HYPERNYM_CORPUS)
        filter_hypernyms(docs, synth.MESH_TREE)
        assert docs[0].filtered_relations == [(("C040", "D950"), "CID")]
        # filtered column rendered after a tab
        assert docs[0].to_string().split("\t")[1] == (
            "veloxin @CHEMICAL@ chest discomfort @DISEASE@ @CID@"
        )


class TestReferenceDifferential:
    @pytest.mark.parametrize(
        "name,segment",
        [
            ("cdr", "both"),
            ("nary", "abstract"),
            ("same_pair", "abstract"),
            ("hypernym", "both"),
        ],
    )
    def test_linearized_output_parity(self, reference, name, segment):
        content = synth.all_fixture_corpora()[name]
        _, ref_lines = _reference_lines(reference, content, text_segment=segment)
        mine = [
            doc.linearize()
            for doc in pubtator.parse_corpus(content, text_segment=segment)
        ]
        assert mine == ref_lines

    def test_skip_malformed_parity(self, reference):
        anns, ref_lines = _reference_lines(
            reference, synth.MALFORMED_CORPUS, skip_malformed=True
        )
        mine = [
            d.linearize()
            for d in pubtator.parse_corpus(synth.MALFORMED_CORPUS, skip_malformed=True)
        ]
        assert mine == ref_lines

    def test_hints_parity(self, reference):
        anns = reference.util.parse_pubtator(pubtator_content=synth.CDR_CORPUS)
        for a in anns:
            a.insert_hints()
        ref_texts = [a.text for a in anns]
        mine = [d.hinted_text() for d in pubtator.parse_corpus(synth.CDR_CORPUS)]
        assert mine == ref_texts

    def test_hypernym_parity(self, reference):
        if reference.cdr is None:
            pytest.skip("reference cdr module not importable")
        anns = reference.util.parse_pubtator(pubtator_content=synth.HYPERNYM_CORPUS)
        # patch the network-backed MeSH download with the synthetic tree
        reference.cdr._download_mesh_tree.cache_clear()
        orig = reference.cdr._download_mesh_tree
        try:
            reference.cdr._download_mesh_tree = lambda: synth.MESH_TREE
            reference.cdr._filter_hypernyms(anns)
        finally:
            reference.cdr._download_mesh_tree = orig
        docs = pubtator.parse_corpus(synth.HYPERNYM_CORPUS)
        filter_hypernyms(docs, synth.MESH_TREE)
        for mine_doc, ref_ann in zip(docs, anns):
            ref_set = {(tuple(r[:-1]), r[-1]) for r in ref_ann.filtered_relations}
            assert set(mine_doc.filtered_relations) == ref_set


class TestJsonRoundTrip:
    def test_roundtrip_preserves_linearization(self):
        import json as _json

        from seq2rel_ds_spark.core.model import document_from_dict, document_to_dict

        docs = pubtator.parse_corpus(synth.CDR_CORPUS)
        for doc in docs:
            blob = _json.dumps(document_to_dict(doc))
            back = document_from_dict(_json.loads(blob))
            assert back.linearize() == doc.linearize()
            assert back.hinted_text() == doc.hinted_text()

    def test_matches_reference_encoder(self, reference):
        import json as _json

        from seq2rel_ds_spark.core.model import document_to_dict

        anns = reference.util.parse_pubtator(pubtator_content=synth.CDR_CORPUS)
        mine = pubtator.parse_corpus(synth.CDR_CORPUS)
        ref_blob = _json.loads(
            _json.dumps([a.dict() for a in anns], default=None)
        )
        my_blob = _json.loads(_json.dumps([document_to_dict(d) for d in mine]))
        for r, m in zip(ref_blob, my_blob):
            assert r["pmid"] == m["pmid"] and r["text"] == m["text"]
            assert set(r["entities"]) == set(m["entities"])
            for uid in r["entities"]:
                assert r["entities"][uid]["mentions"] == m["entities"][uid]["mentions"]
                assert [list(o) for o in r["entities"][uid]["offsets"]] == [
                    list(o) for o in m["entities"][uid]["offsets"]
                ]
