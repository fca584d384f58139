"""seq2rel_ds_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
preprocessing library (JohnGiorgi/seq2rel-ds, read-only at /root/reference)
as an idiomatic, scale-out Spark DataFrame pipeline:

    pages (parquet/Iceberg scan)
      -> extract        (html -> byte-identical text, Arrow-batched UDF)
      -> parse/align    (PubTator-style mention + relation normalization,
                         pure Catalyst where possible)
      -> link           (broadcast dictionary join + batched context scorer)
      -> cluster        (gold-uid grouping for parity; connected components
                         over mention-pair edges for raw web text)
      -> triples        (canonical (subj, pred, obj) with salted dedup)
      -> linearize      (reference-parity "text \\t relation-string" sink)

Design rules (enforced throughout):
  * DataFrame / Spark SQL only; no RDDs.
  * No per-row Python UDFs — vectorized pandas/Arrow UDFs only, and only
    where Catalyst genuinely cannot express the semantics.
  * Every ordering the reference gets from Python's stable sorts is made
    explicit with composite sort keys (Spark sorts are not stable).
  * Skew-sensitive aggregations (hub entities) use two-phase salted
    aggregation; joins against small dimensions are broadcast.
"""

__version__ = "0.1.0"
