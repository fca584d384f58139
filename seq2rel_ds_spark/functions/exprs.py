"""Reusable Catalyst expression builders.

All document-local semantics run JVM-side through these helpers; they are the
building blocks of the parse/linearize operators.  No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws_col(col: Column, lowercase: bool = False) -> Column:
    """Whitespace collapse identical to core.text.normalize_ws:
    ``regexp_replace(trim(col), '\\s+', ' ')`` (+ optional lower)."""
    out = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.lower(out) if lowercase else out


def is_int_col(col: Column) -> Column:
    """True when the string column parses as an integer (ANSI-safe)."""
    return col.try_cast("int").isNotNull()


def span_weight(start: Column, end: Column) -> Column:
    """The reference's first-appearance proxy: start + end (schemas.py:35)."""
    return (start + end).cast("long")
