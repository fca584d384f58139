"""Hypernym-aware negative-relation filtering (CDR semantics).

Parity target: /root/reference/seq2rel_ds/cdr.py:47-93.  Given per-document
positive (chemical, disease) relations and a MeSH tree-number multimap, mark
every *negative* candidate (chemical x disease not annotated positive) whose
chemical matches a positive's chemical and whose disease is an ancestor
(tree-number substring) of that positive's disease.

The reference materializes negatives via ``set(...) - set(...)`` whose
iteration order is hash-randomized across processes; outputs here are
generated in deterministic (chem, diso) sorted order, and parity tests
compare filtered relations as sets.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from seq2rel_ds_spark.core.model import Document


def infer_schema_labels(
    docs: Sequence[Document],
) -> Tuple[str, str, str]:
    """Entity labels of head/tail plus the relation label, inferred from the
    first document that has relations (cdr.py:55-61)."""
    for doc in docs:
        if doc.relations:
            (head_uid, tail_uid), rel_label = doc.relations[0][0], doc.relations[0][1]
            by_uid = doc.cluster_map()
            return by_uid[head_uid].label, by_uid[tail_uid].label, rel_label
    raise ValueError("no document with relations; cannot infer labels")


def filter_hypernyms(
    docs: Sequence[Document], mesh_tree: Dict[str, List[str]]
) -> None:
    """Populate ``doc.filtered_relations`` in place for every document."""
    chem_label, diso_label, rel_label = infer_schema_labels(docs)

    for doc in docs:
        doc.filtered_relations = []
        chems = [c.uid for c in doc.clusters if c.label == chem_label]
        disos = [c.uid for c in doc.clusters if c.label == diso_label]
        positives = {(uids[0], uids[1]) for uids, _ in doc.relations}
        flagged = []
        for chem in sorted(chems):
            for diso in sorted(disos):
                if (chem, diso) in positives:
                    continue
                neg_trees = mesh_tree.get(diso, [])
                hit = any(
                    neg_t in pos_t
                    for pos_chem, pos_diso in positives
                    if pos_chem == chem
                    for pos_t in mesh_tree.get(pos_diso, [])
                    for neg_t in neg_trees
                )
                if hit:
                    flagged.append(((chem, diso), rel_label))
        # de-dup while preserving order (cdr.py:92-93)
        seen = set()
        for rel in flagged:
            if rel not in seen:
                seen.add(rel)
                doc.filtered_relations.append(rel)
