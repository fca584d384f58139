"""Corpus-plan tests: CDR/GDA/DocRED/DGM end-to-end split semantics."""

import json

from tests.fixtures import synth


class TestCDRPlan:
    def test_valid_test_get_filter_column(self, spark):
        from seq2rel_ds_spark.plans.corpora import preprocess_cdr
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings

        mesh = spark.createDataFrame(
            [(uid, t) for uid, trees in synth.MESH_TREE.items() for t in trees],
            "uid string, tree string",
        )
        train = docs_from_strings(spark, synth.CDR_CORPUS)
        valid = docs_from_strings(spark, synth.HYPERNYM_CORPUS)
        test = docs_from_strings(spark, synth.HYPERNYM_CORPUS)
        out = preprocess_cdr(train, valid, test, mesh)
        train_line = out["train"].first()["line"]
        valid_line = out["valid"].first()["line"]
        # train: 2 cols; valid/test: 3 cols (filtered relations)
        assert train_line.count("\t") == 1
        assert valid_line.count("\t") == 2
        assert valid_line.endswith("veloxin @CHEMICAL@ chest discomfort @DISEASE@ @CID@")

    def test_combine_train_valid(self, spark):
        from seq2rel_ds_spark.plans.corpora import preprocess_cdr
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings

        mesh = spark.createDataFrame(
            [(uid, t) for uid, trees in synth.MESH_TREE.items() for t in trees],
            "uid string, tree string",
        )
        train = docs_from_strings(spark, synth.CDR_CORPUS)
        valid = docs_from_strings(spark, synth.HYPERNYM_CORPUS)
        test = docs_from_strings(spark, synth.HYPERNYM_CORPUS)
        out = preprocess_cdr(train, valid, test, mesh, combine_train_valid=True)
        assert "valid" not in out
        assert out["train"].count() == 4  # 3 CDR docs + 1 hypernym doc


class TestGDAPlan:
    def test_holdout_split(self, spark):
        from seq2rel_ds_spark.plans.corpora import preprocess_gda
        from seq2rel_ds_spark.sources.gda import gda_from_strings

        docs = gda_from_strings(spark, synth.GDA_ABSTRACTS, synth.GDA_ANNS, synth.GDA_LABELS)
        out = preprocess_gda(docs, docs, valid_size=0.5)
        n_train = out["train"].count()
        n_valid = out["valid"].count()
        assert n_train + n_valid == 2
        assert out["test"].count() == 2


class TestDGMPlan:
    def test_pmid_split_and_holdout(self, spark):
        from seq2rel_ds_spark.plans.corpora import preprocess_dgm
        from seq2rel_ds_spark.sources.dgm import dgm_documents

        jsonl = [json.dumps(e) for e in synth.DGM_EXAMPLES]
        docs = dgm_documents(spark.read.json(spark.sparkContext.parallelize(jsonl)))
        train_pmids = spark.createDataFrame([("7001",)], "pmid string")
        dev_pmids = spark.createDataFrame([("7003",)], "pmid string")
        out = preprocess_dgm(docs, train_pmids, dev_pmids, valid_size=0)
        assert out["train"].count() == 1
        assert out["test"].count() == 1
        # 7003's candidate references variant v1v with no mention -> dropped
        assert out["test"].first()["line"].endswith("\t")


class TestHintSource:
    def test_inner_join_drop(self, spark):
        from seq2rel_ds_spark.operators.parse import parse_documents
        from seq2rel_ds_spark.plans.corpora import apply_hint_source
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings

        parsed = parse_documents(docs_from_strings(spark, synth.CDR_CORPUS))
        hints = spark.createDataFrame(
            [("101", "HINTED [SEP] text body")], "doc_id string, text string"
        )
        out = apply_hint_source(parsed, hints)
        rows = out.select("doc_id", "text").collect()
        assert len(rows) == 1 and rows[0]["text"].startswith("HINTED")


class TestWriteTsvGuard:
    def test_embedded_newline_raises(self, spark, tmp_path):
        """write_tsv must fail loudly (raise_error in the write job) when a
        line contains an embedded newline — silently writing it would split
        one logical row across physical lines and corrupt the TSV."""
        import pytest

        from seq2rel_ds_spark.plans.corpora import write_tsv

        bad = spark.createDataFrame([("ok line",), ("bad\nline",)], "line string")
        with pytest.raises(Exception, match="newline"):
            write_tsv({"train": bad}, str(tmp_path / "out"))

    def test_clean_lines_roundtrip(self, spark, tmp_path):
        from seq2rel_ds_spark.plans.corpora import write_tsv

        ok = spark.createDataFrame([("a\tb",), ("c\td",)], "line string")
        counts = write_tsv({"train": ok}, str(tmp_path / "out"))
        assert counts == {"train": 2}
