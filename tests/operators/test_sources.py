"""GDA / DocRED / DGM sources vs the reference converters (differential)."""

import json

import pytest

from seq2rel_ds_spark.operators.linearize import linearize
from seq2rel_ds_spark.operators.parse import parse_documents
from seq2rel_ds_spark.sources.dgm import dgm_documents, filter_by_pmids
from seq2rel_ds_spark.sources.docred import docred_documents
from seq2rel_ds_spark.sources.gda import gda_from_strings
from tests.fixtures import synth


def _ref_seq2rel(reference, pubtator_content, segment):
    anns = reference.util.parse_pubtator(
        pubtator_content=pubtator_content,
        text_segment=reference.util.TextSegment(segment),
    )
    return reference.util.pubtator_to_seq2rel(anns)


class TestGDASource:
    def _docs(self, spark):
        return gda_from_strings(
            spark, synth.GDA_ABSTRACTS, synth.GDA_ANNS, synth.GDA_LABELS
        )

    def test_shape(self, spark):
        rows = {r["doc_id"]: r for r in self._docs(spark).collect()}
        assert set(rows) == {"9001", "9002"}
        assert rows["9002"]["abstract"] == ""
        assert any("GDA" in ln for ln in rows["9001"]["ann_lines"])

    def test_matches_reference(self, spark, reference):
        import seq2rel_ds.gda as ref_gda

        pubtator = ref_gda._convert_to_pubtator(
            abstracts=synth.GDA_ABSTRACTS, anns=synth.GDA_ANNS, labels=synth.GDA_LABELS
        )
        ref_lines = sorted(_ref_seq2rel(reference, pubtator, "both"))
        mine = sorted(
            r["line"]
            for r in linearize(parse_documents(self._docs(spark), reanchor=False)).collect()
        )
        assert mine == ref_lines


class TestDocREDSource:
    def _docs(self, spark):
        examples = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(e) for e in synth.DOCRED_EXAMPLES])
        )
        rel_labels = {
            k: v["verbose"] for k, v in synth.DOCRED_TYPES["relations"].items()
        }
        return docred_documents(examples, rel_labels)

    def test_matches_reference(self, spark, reference):
        import seq2rel_ds.docred as ref_docred

        rel_labels = {
            k: v["verbose"] for k, v in synth.DOCRED_TYPES["relations"].items()
        }
        pubtator = ref_docred._convert_to_pubtator(
            synth.DOCRED_EXAMPLES, rel_labels=rel_labels
        )
        ref_lines = sorted(_ref_seq2rel(reference, pubtator, "abstract"))
        mine = sorted(
            r["line"]
            for r in linearize(
                parse_documents(self._docs(spark), text_segment="abstract", reanchor=False)
            ).collect()
        )
        assert mine == ref_lines

    def test_no_label_doc_has_empty_relations(self, spark):
        out = linearize(
            parse_documents(self._docs(spark), text_segment="abstract", reanchor=False)
        )
        lines = [r["line"] for r in out.collect()]
        quiet = [ln for ln in lines if "Quiet village" in ln]
        assert len(quiet) == 1 and quiet[0].endswith("\t")


class TestDGMSource:
    def _docs(self, spark):
        jsonl = [json.dumps(e) for e in synth.DGM_EXAMPLES]
        examples = spark.read.json(spark.sparkContext.parallelize(jsonl))
        return dgm_documents(examples)

    def test_drops_empty_candidates(self, spark):
        ids = {r["doc_id"] for r in self._docs(spark).select("doc_id").collect()}
        assert ids == {"7001", "7003"}

    def test_matches_reference(self, spark, reference):
        import seq2rel_ds.dgm as ref_dgm

        kept = [e for e in synth.DGM_EXAMPLES if e["triple_candidates"]]
        pubtator = ref_dgm._convert_to_pubtator(kept)
        ref_lines = sorted(_ref_seq2rel(reference, pubtator, "abstract"))
        mine = sorted(
            r["line"]
            for r in linearize(
                parse_documents(self._docs(spark), text_segment="abstract", reanchor=False)
            ).collect()
        )
        assert mine == ref_lines

    def test_pmid_split_semi_join(self, spark):
        pmids = spark.createDataFrame([("7001",)], "pmid string")
        out = filter_by_pmids(self._docs(spark), pmids)
        assert [r["doc_id"] for r in out.select("doc_id").collect()] == ["7001"]


class TestHypernymOperator:
    def test_matches_core(self, spark):
        from seq2rel_ds_spark.operators.hypernym import filter_hypernyms
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings
        from seq2rel_ds_spark.operators.linearize import linearize as lin

        mesh = spark.createDataFrame(
            [(uid, t) for uid, trees in synth.MESH_TREE.items() for t in trees],
            "uid string, tree string",
        )
        docs = docs_from_strings(spark, synth.HYPERNYM_CORPUS)
        parsed = filter_hypernyms(parse_documents(docs), mesh)
        out = lin(parsed)
        line = out.first()["line"]
        # core golden (already reference-verified in test_pubtator_core)
        assert line.split("\t")[2] == "veloxin @CHEMICAL@ chest discomfort @DISEASE@ @CID@"

    def test_no_flag_docs_get_null_literal(self, spark):
        from seq2rel_ds_spark.operators.hypernym import filter_hypernyms
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings

        mesh = spark.createDataFrame(
            [(uid, t) for uid, trees in synth.MESH_TREE.items() for t in trees],
            "uid string, tree string",
        )
        docs = docs_from_strings(spark, synth.CDR_CORPUS)
        parsed = filter_hypernyms(parse_documents(docs), mesh)
        out = linearize(parsed)
        for r in out.collect():
            assert r["line"].split("\t")[2] == "null"
