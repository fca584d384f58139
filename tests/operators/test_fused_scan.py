"""Fused doc-local scan (extract+scan+link+relations in one Arrow pass) must
be row-identical to the modular Catalyst operators."""


class TestFusedRelationScan:
    def test_equals_modular_path(self, spark):
        from seq2rel_ds_spark.operators.mention import (
            cue_rows,
            fused_relation_scan,
            link_mentions,
            mention_rows,
            scan_pages,
        )
        from seq2rel_ds_spark.operators.triples import extract_relations
        from seq2rel_ds_spark.sources import pages as pages_src

        pages = pages_src.synthesize_pages(spark, 120, partitions=4).cache()
        d = pages_src.dictionary_df(spark)
        dict_rows = [
            (r["surface"], r["uid"], r["label"], r["is_canonical"]) for r in d.collect()
        ]
        fused = {
            tuple(r)
            for r in fused_relation_scan(pages, dict_rows, pages_src.PREDICATES).collect()
        }
        scans = scan_pages(
            pages, [r[0] for r in dict_rows], pages_src.PREDICATES
        ).cache()
        modular = {
            tuple(r)
            for r in extract_relations(
                link_mentions(mention_rows(scans), d), cue_rows(scans)
            ).collect()
        }
        assert fused == modular and len(fused) > 0
        pages.unpersist()
        scans.unpersist()

    def test_arrow_native_source_equals_jvm_scan(self, spark, tmp_path):
        """The Arrow-native parquet path (python workers read their
        row-group splits with pyarrow) must produce the identical relation
        multiset as the JVM scan over the same files."""
        from seq2rel_ds_spark.operators.mention import (
            fused_relation_scan,
            fused_relation_scan_arrow,
        )
        from seq2rel_ds_spark.sources import pages as pages_src

        path = str(tmp_path / "pages")
        pages_src.synthesize_pages(spark, 150, partitions=3).write.parquet(path)
        d = pages_src.dictionary_df(spark)
        dict_rows = [
            (r["surface"], r["uid"], r["label"], r["is_canonical"]) for r in d.collect()
        ]
        jvm = sorted(
            tuple(r)
            for r in fused_relation_scan(
                spark.read.parquet(path), dict_rows, pages_src.PREDICATES
            ).collect()
        )
        arrow = sorted(
            tuple(r)
            for r in fused_relation_scan_arrow(
                spark, path, dict_rows, pages_src.PREDICATES, batch_size=64
            ).collect()
        )
        assert jvm == arrow and len(jvm) > 0

    def test_fused_combine_partials_equal_instance_path(self, spark, tmp_path):
        """The fused-combine flagship path (map-side partial triple counts in
        the Python task, final merge in Catalyst) must produce the identical
        canonical triple table — keys AND n_support — as the instance-row
        path through the salted two-phase aggregate, on BOTH scan sources."""
        from seq2rel_ds_spark.operators.mention import (
            fused_relation_scan,
            fused_triple_partials,
            fused_triple_partials_arrow,
        )
        from seq2rel_ds_spark.operators.triples import (
            canonicalize_from_partials,
            canonicalize_triples,
        )
        from seq2rel_ds_spark.sources import pages as pages_src

        path = str(tmp_path / "pages")
        pages_src.synthesize_pages(spark, 150, partitions=3).write.parquet(path)
        pages = spark.read.parquet(path)
        d = pages_src.dictionary_df(spark)
        dict_rows = [
            (r["surface"], r["uid"], r["label"], r["is_canonical"]) for r in d.collect()
        ]

        def table(df):
            return sorted(tuple(r) for r in df.collect())

        reference = table(
            canonicalize_triples(
                fused_relation_scan(pages, dict_rows, pages_src.PREDICATES), salt_buckets=8
            )
        )
        combine_jvm = table(
            canonicalize_from_partials(
                fused_triple_partials(pages, dict_rows, pages_src.PREDICATES)
            )
        )
        combine_arrow = table(
            canonicalize_from_partials(
                fused_triple_partials_arrow(
                    spark, path, dict_rows, pages_src.PREDICATES, batch_size=64
                )
            )
        )
        assert reference == combine_jvm == combine_arrow and len(reference) > 0

    def test_core_link_semantics(self):
        from seq2rel_ds_spark.core.link import (
            build_dictionary,
            link_doc_mentions,
            select_relations,
        )

        d = build_dictionary(
            [
                ("vexal", "DRUG1", "DRUG", True),
                ("vexal", "GENE9", "GENE", True),  # ambiguous surface
                ("cardiosis", "DIS1", "DISEASE", True),
                ("vexanib", "DRUG1", "DRUG", False),
            ]
        )
        mentions = [
            (0, 0, 5, "vexal"),
            (0, 20, 29, "cardiosis"),
            (1, 40, 47, "vexanib"),  # second DRUG mention -> DRUG coherence wins
        ]
        linked = link_doc_mentions(mentions, d)
        by_span = {(m[1], m[2]): m[4] for m in linked}
        assert by_span[(0, 5)] == "DRUG1"  # DRUG label_hits=2 > GENE=1
        rels = select_relations(linked, [(0, 10, "CAUSES")])
        assert rels == [(0, "DRUG1", "CAUSES", "DIS1")]

    def test_unknown_surface_dropped(self):
        from seq2rel_ds_spark.core.link import build_dictionary, link_doc_mentions

        d = build_dictionary([("known", "U1", "X", True)])
        assert link_doc_mentions([(0, 0, 7, "unknown")], d) == []
