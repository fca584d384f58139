"""DataFrame operators: parse/align, linearize, hypernym filter, clustering,
dedup, similarity, text analytics.  Document-local semantics are expressed as
array-column higher-order functions (no shuffle); cross-document operators
use broadcast joins / salted aggregations.
"""
