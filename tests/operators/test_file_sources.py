"""File-based source readers (the paths exercised by real corpus layouts)."""

import json

from tests.fixtures import synth


class TestFileSources:
    def test_read_pubtator_file(self, spark, tmp_path):
        from seq2rel_ds_spark.operators.linearize import linearize
        from seq2rel_ds_spark.operators.parse import parse_documents
        from seq2rel_ds_spark.sources.pubtator import docs_from_strings, read_pubtator

        p = tmp_path / "corpus.txt"
        p.write_text(synth.CDR_CORPUS)
        from_file = sorted(
            r["line"]
            for r in linearize(parse_documents(read_pubtator(spark, str(p)))).collect()
        )
        from_str = sorted(
            r["line"]
            for r in linearize(
                parse_documents(docs_from_strings(spark, synth.CDR_CORPUS))
            ).collect()
        )
        assert from_file == from_str

    def test_read_gda_files(self, spark, tmp_path):
        from seq2rel_ds_spark.sources.gda import gda_from_strings, read_gda

        (tmp_path / "abstracts.txt").write_text(synth.GDA_ABSTRACTS)
        (tmp_path / "anns.txt").write_text(synth.GDA_ANNS)
        (tmp_path / "labels.csv").write_text(synth.GDA_LABELS)
        from_file = read_gda(
            spark,
            str(tmp_path / "abstracts.txt"),
            str(tmp_path / "anns.txt"),
            str(tmp_path / "labels.csv"),
        )
        from_str = gda_from_strings(
            spark, synth.GDA_ABSTRACTS, synth.GDA_ANNS, synth.GDA_LABELS
        )
        a = {(r["doc_id"], tuple(r["ann_lines"])) for r in from_file.collect()}
        b = {(r["doc_id"], tuple(r["ann_lines"])) for r in from_str.collect()}
        assert a == b

    def test_read_docred_file(self, spark, tmp_path):
        from seq2rel_ds_spark.sources.docred import read_docred

        p = tmp_path / "train_joint.json"
        p.write_text(json.dumps(synth.DOCRED_EXAMPLES))
        rel_labels = {
            k: v["verbose"] for k, v in synth.DOCRED_TYPES["relations"].items()
        }
        docs = read_docred(spark, str(p), rel_labels)
        assert docs.count() == 3
        lines = [ln for r in docs.collect() for ln in r["ann_lines"]]
        assert any("LOCATED_IN_THE_ADMINISTRATIVE_TERRITORIAL_ENTITY" in ln for ln in lines)

    def test_read_dgm_file(self, spark, tmp_path):
        from seq2rel_ds_spark.sources.dgm import read_dgm

        p = tmp_path / "ds_train_dev.txt"
        p.write_text("\n".join(json.dumps(e) for e in synth.DGM_EXAMPLES))
        docs = read_dgm(spark, str(p))
        assert {r["doc_id"] for r in docs.select("doc_id").collect()} == {"7001", "7003"}

    def test_read_mesh_tree_file(self, spark, tmp_path):
        from seq2rel_ds_spark.sources.mesh import read_mesh_tree

        p = tmp_path / "2017MeshTree.txt"
        p.write_text(
            "tree_numbers\tmesh_uid\tname\n"
            "F01.100\tD950\tChest Discomfort\n"
            "F01.100.200\tD951\tChest Spasm\n"
            "G02.300\tD900\tVisual Fog\n"
            "G02.301\tD900\tVisual Fog Alt\n"
        )
        rows = {(r["uid"], r["tree"]) for r in read_mesh_tree(spark, str(p)).collect()}
        assert rows == {
            ("D950", "F01.100"),
            ("D951", "F01.100.200"),
            ("D900", "G02.300"),
            ("D900", "G02.301"),
        }
