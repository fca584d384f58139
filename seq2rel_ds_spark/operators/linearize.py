"""Linearization operators — pure Catalyst, zero Python, zero shuffle.

Re-expresses the reference's entity/relation serialization
(/root/reference/seq2rel_ds/common/schemas.py:26-133 and util.py:232-282)
as higher-order array expressions over the parsed document rows.

Ordering strategy: everywhere the reference leans on Python's *stable*
sorts, we sort once on an explicit composite key (documented per step), so
the result is deterministic under Spark's unstable sort.  See
core.model.relation_sort_key for the equivalence proof of the relation key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seq2rel_ds_spark.functions.exprs import normalize_ws_col

COREF_SEP = ";"
HINT_SEP = "[SEP]"


def _ordered_forms(members: Column) -> Column:
    """Mention surfaces of one cluster, first-appearance order, lowercased,
    order-preserving deduped (schemas.py:26-44).

    Key (start+end, seq) == stable sort by span weight over append order.
    """
    keyed = F.array_sort(
        F.transform(
            members,
            lambda m: F.struct(
                (m["start"] + m["end"]).cast("long").alias("w"),
                m["seq"].alias("seq"),
                normalize_ws_col(m["surface"], lowercase=True).alias("form"),
            ),
        )
    )
    return F.array_distinct(F.transform(keyed, lambda k: k["form"]))


def cluster_string(cluster: Column) -> Column:
    """`mention ; mention @LABEL@` for one cluster struct (schemas.py:42-43)."""
    coref = F.array_join(_ordered_forms(cluster["members"]), f" {COREF_SEP} ")
    return F.concat(
        F.lower(F.trim(coref)), F.lit(" @"), F.upper(F.trim(cluster["label"])), F.lit("@")
    )


def cluster_first_weight(cluster: Column) -> Column:
    """start+end of the first-appearing mention (schemas.py:46-48); ties on
    span weight resolve to the earliest-appended member via seq."""
    first = F.get(
        F.array_sort(
            F.transform(
                cluster["members"],
                lambda m: F.struct(
                    (m["start"] + m["end"]).cast("long").alias("w"),
                    m["seq"].alias("seq"),
                ),
            )
        ),
        0,
    )
    return first["w"]


def with_cluster_info(parsed: DataFrame) -> DataFrame:
    """Adds `cluster_info`: map uid -> struct(str, w, idx) reused by hints,
    relation strings and the canonical triple emitter."""
    infos = F.transform(
        F.col("clusters"),
        lambda c, i: F.struct(
            c["uid"].alias("uid"),
            F.struct(
                cluster_string(c).alias("str"),
                cluster_first_weight(c).alias("w"),
                i.cast("long").alias("idx"),
            ).alias("info"),
        ),
    )
    return parsed.withColumn(
        "cluster_info",
        F.map_from_entries(
            F.when(F.size("clusters") > 0, infos).otherwise(
                F.expr("array(struct('' as uid, struct('' as str, 0L as w, 0L as idx) as info))")
            )
        ),
    )


def with_hinted_text(parsed_with_info: DataFrame) -> DataFrame:
    """Entity hints prepended to text (schemas.py:62-80).

    Order: (first-mention weight, cluster insertion idx) — the reference's
    stable sort by weight over dict insertion order.
    """
    entries = F.map_values("cluster_info")
    ordered = F.array_sort(
        F.transform(entries, lambda e: F.struct(e["w"].alias("w"), e["idx"].alias("idx"), e["str"].alias("s")))
    )
    strings = F.array_distinct(F.transform(ordered, lambda o: o["s"]))
    hint = F.concat(F.trim(F.array_join(strings, " ")), F.lit(f" {HINT_SEP}"))
    hinted = F.concat(F.trim(hint), F.lit(" "), F.trim("text"))
    return parsed_with_info.withColumn(
        "text", F.when(F.size("clusters") > 0, hinted).otherwise(F.concat(F.lit(f"{HINT_SEP} "), F.trim("text")))
    )


SHUFFLE_SEED = 13370


def _relation_strings(
    parsed_col_relations: Column, info: Column, sort_rels: bool = True
) -> Column:
    """Array of linearized relation strings in reference order
    (schemas.py:82-133).

    Composite key per relation (entity weights w_0..w_{n-1}, insertion i):
        [w_{n-2}, ..., w_0, sum(w), i]
    == the reference's stable multi-pass sort sequence; arrays compare
    lexicographically so mixed positions order exactly as the passes do.

    ``sort_rels=False`` is the reference's ablation path (schemas.py:125:
    ``random.shuffle``); distributed determinism demands a SEEDED shuffle,
    so the key becomes xxhash64(seed, doc_id, relation string) — pseudo-
    random order, reproducible across runs and partitionings.
    """

    def _shuffle_key(s: Column, i: Column) -> Column:
        return F.array(
            F.xxhash64(F.lit(SHUFFLE_SEED), F.col("doc_id"), s), i.cast("long")
        )

    def _ref_key(r: Column, i: Column) -> Column:
        return F.concat(
            F.reverse(
                F.slice(
                    F.transform(r["uids"], lambda u: F.element_at(info, u)["w"]),
                    1,
                    F.greatest(F.size(r["uids"]) - 1, F.lit(0)),
                )
            ),
            F.array(
                F.aggregate(
                    F.transform(r["uids"], lambda u: F.element_at(info, u)["w"]),
                    F.lit(0).cast("long"),
                    lambda acc, w: acc + w,
                )
            ),
            F.array(i.cast("long")),
        )

    def _string(r: Column) -> Column:
        return normalize_ws_col(
            F.concat(
                F.array_join(
                    F.transform(r["uids"], lambda u: F.element_at(info, u)["str"]), " "
                ),
                F.lit(" @"),
                F.upper(r["label"]),
                F.lit("@"),
            )
        )

    keyed = F.transform(
        parsed_col_relations,
        lambda r, i: F.struct(
            (_ref_key(r, i) if sort_rels else _shuffle_key(_string(r), i)).alias("key"),
            _string(r).alias("s"),
        ),
    )
    return F.array_distinct(F.transform(F.array_sort(keyed), lambda k: k["s"]))


def with_relation_string(parsed_with_info: DataFrame, sort_rels: bool = True) -> DataFrame:
    """Adds `relation_string` (+ folds in `filtered_relations` when the
    column is present — schemas.py:96-106,131-132)."""
    df = parsed_with_info
    rel_str = F.trim(
        F.array_join(
            _relation_strings(F.col("relations"), F.col("cluster_info"), sort_rels), " "
        )
    )
    if "filtered_relations" in df.columns:
        # filtered strings keep their given order and are NOT deduped at
        # string level (schemas.py:98-106); empty array renders as "null".
        fstrs = F.transform(
            F.col("filtered_relations"),
            lambda r: normalize_ws_col(
                F.concat(
                    F.array_join(
                        F.transform(
                            r["uids"], lambda u: F.element_at(F.col("cluster_info"), u)["str"]
                        ),
                        " ",
                    ),
                    F.lit(" @"),
                    F.upper(r["label"]),
                    F.lit("@"),
                )
            ),
        )
        tail = F.when(F.size("filtered_relations") > 0, F.trim(F.array_join(fstrs, " "))).otherwise(
            F.lit("null")
        )
        rel_str = F.when(
            F.col("filtered_relations").isNotNull(), F.concat(rel_str, F.lit("\t"), tail)
        ).otherwise(rel_str)
    return df.withColumn("relation_string", rel_str)


def linearize(parsed: DataFrame, hints: bool = False, sort_rels: bool = True) -> DataFrame:
    """Full seq2rel sink row: `line = trim(text) \\t trim(relation_string)`
    (util.py:278-280).  Returns (doc_id, text, relation_string, line).

    ``sort_rels=False``: ablation ordering (seeded deterministic shuffle of
    the relation strings — see _relation_strings)."""
    df = with_cluster_info(parsed)
    if hints:
        df = with_hinted_text(df)
    df = with_relation_string(df, sort_rels=sort_rels)
    return df.select(
        "doc_id",
        "text",
        "relation_string",
        F.concat(F.trim("text"), F.lit("\t"), F.trim("relation_string")).alias("line"),
    )
