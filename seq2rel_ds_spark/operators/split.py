"""Dataset split operators.

Reference parity (util.py:93-111, gda.py:151-154, dgm.py:160-163): sklearn
``train_test_split`` with fixed global seeds.  Row-exact sklearn splits don't
distribute; the engine offers both of Spark's idioms:

  * ``random_split`` — ``DataFrame.randomSplit`` with an explicit seed
    (approximate sizes, the standard Spark approach)
  * ``hash_split`` — deterministic bucketing on ``xxhash64(key)``:
    partition-count-independent, reproducible across runs and cluster sizes,
    and stable under data growth (a row's split never changes) — the correct
    tool at 10^12 documents.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 13370  # reference's global seed (util.py:20)

_SPLIT_NAMES = ["train", "valid", "test"]


def _split_names(weights) -> List[str]:
    """One name per weight.  The named splits are train/valid/test; passing
    more weights than names would silently assign the tail buckets to NO
    split (rows vanish despite weights summing to one), so it is an error."""
    if len(weights) > len(_SPLIT_NAMES):
        raise ValueError(
            f"at most {len(_SPLIT_NAMES)} splits supported "
            f"({'/'.join(_SPLIT_NAMES)}); got {len(weights)} weights"
        )
    return _SPLIT_NAMES[: len(weights)]


def random_split(
    df: DataFrame, weights: Tuple[float, ...] = (0.7, 0.1, 0.2), seed: int = SEED
) -> List[DataFrame]:
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split sizes must sum to one. Got {sum(weights)}.")
    return df.randomSplit(list(weights), seed=seed)


def md5_split(
    df: DataFrame,
    key: str,
    weights: Tuple[float, ...] = (0.7, 0.1, 0.2),
    salt: str = "split",
) -> Dict[str, DataFrame]:
    """``hash_split`` variant bucketed on the first two hex digits of
    md5(salt:key) — 256 buckets.  Same determinism guarantees; the hash is
    portable across engines (every warehouse speaks md5 over strings, while
    xxhash64 is Spark-specific), which makes split assignments reproducible
    by external systems and auditable by the SQL oracle gate."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split sizes must sum to one. Got {sum(weights)}.")
    buckets = 256
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")
    names = _split_names(weights)
    out = {}
    lo = 0
    for i, (name, w) in enumerate(zip(names, weights)):
        hi = buckets if i == len(weights) - 1 else lo + int(round(w * buckets))
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Dict[str, float],
    key: str,
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli downsampling: keep a row iff its
    uniform 32-bit draw (first 4 md5 bytes of ``salt:key``) falls below the
    stratum's keep-rate — the distribution-rebalancing op a training-data
    pipeline runs to cap an over-represented language/source.

    Scale shape: a PURE FILTER — no shuffle, no state; Catalyst pushes it
    into the scan stage.  The md5 draw makes the sample repeatable across
    runs, partition counts and engines (same portability argument as
    ``md5_split``), stable under data growth (a row's fate never changes),
    and auditable by the SQL oracle gate.  The rates map compiles to a
    literal CASE expression — strata are dimension-sized by definition."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
    )
    mapping = F.create_map(
        *[lit for s, r in rates.items() for lit in (F.lit(s), F.lit(float(r)))]
    )
    rate = F.coalesce(mapping[F.col(strata_col)], F.lit(float(default_rate)))
    # threshold = rate * 2^32; both factors exact in double, one multiply
    return df.filter(draw < rate * F.lit(4294967296.0))


def hash_split(
    df: DataFrame,
    key: str,
    weights: Tuple[float, ...] = (0.7, 0.1, 0.2),
    buckets: int = 1000,
    salt: str = "split",
) -> Dict[str, DataFrame]:
    """Deterministic {train, valid, test} split on hash(key) bucket ranges."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split sizes must sum to one. Got {sum(weights)}.")
    bucket = F.pmod(F.xxhash64(F.concat_ws(":", F.lit(salt), F.col(key))), F.lit(buckets))
    names = _split_names(weights)
    out = {}
    lo = 0
    for i, (name, w) in enumerate(zip(names, weights)):
        # the final split takes every remaining bucket: rounded widths may
        # not sum to `buckets` (e.g. thirds -> 333+333+333), and truncating
        # would silently drop the trailing buckets from every split
        hi = buckets if i == len(weights) - 1 else lo + int(round(w * buckets))
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out
