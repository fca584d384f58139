"""Bucketed interval (range) join.

Training-data-pipeline extension (SURVEY.md §2.8/2.9 family) — the
reference pipeline has no time-series joins; a 100 TB event store needs
"events within [start, end] of some interval" constantly (attribution
windows, incident windows, session containment).

Spark has no range-join primitive, and the naive formulation
``events JOIN intervals ON key AND ts BETWEEN start AND end`` plans as an
equi-join on key with the BETWEEN as a post-join filter — correct, but a
hub key (one user with millions of events × thousands of intervals)
degenerates to a per-key cross product.  The scale shape is BUCKET
DECOMPOSITION: explode each interval into the fixed-width time buckets it
overlaps (bounded fan-out = interval_width / bucket_width + 1), join on
(key, bucket) — a plain shuffled equi-join AQE can skew-split — then apply
the exact [start, end] residual predicate.  An event carries exactly ONE
bucket, so a pair can only meet in one bucket and the join emits no
duplicates (no post-join dedup shuffle).

All timestamps travel as unix MICROS (bigint): bucket math is integer
division, the residual compare is integer-exact, and the same arithmetic
is reproducible by any engine (the oracle gate restates the join as a
theta join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    event_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Inner-join ``events`` to every interval of the same key(s) whose
    [start_us, end_us] (inclusive) contains the event's ``event_ts_us``.

    Returns all columns of both inputs.  ``bucket_width_us`` trades
    interval fan-out (width/bucket + 1 exploded rows per interval) against
    join selectivity (wider buckets = more residual-filtered pairs);
    the default 1 hour suits attribution-window-sized intervals.
    """
    if bucket_width_us <= 0:
        raise ValueError(f"bucket_width_us must be positive, got {bucket_width_us}")
    w = F.lit(int(bucket_width_us))
    # collision-proof working column: keep prefixing until the name is
    # free in BOTH schemas (deterministic, so repeated plans stay
    # cache/canonicalization-friendly — no uuid churn), instead of
    # silently overwriting and then dropping a caller's `_bucket`
    bcol = "_bucket"
    taken = set(events.columns) | set(intervals.columns)
    while bcol in taken:
        bcol = "_" + bcol

    def _bucket(col: str):
        # exact integer floor-division: (x - x % w) / w divides an exact
        # multiple, so the double quotient is exact (plain x / w could
        # round across a bucket boundary at large micros)
        return ((F.col(col) - F.pmod(F.col(col), w)) / w).cast("long")

    iv = intervals.withColumn(
        bcol, F.explode(F.sequence(_bucket(start_us), _bucket(end_us)))
    )
    ev = events.withColumn(bcol, _bucket(event_ts_us))
    joined = ev.join(iv, [*keys, bcol]).filter(
        (F.col(event_ts_us) >= F.col(start_us))
        & (F.col(event_ts_us) <= F.col(end_us))
    )
    return joined.drop(bcol)
