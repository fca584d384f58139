"""Document / cluster / relation model + reference-parity linearization.

This is the engine's *semantic core*: a tiny, Spark-free, functional
re-statement of what the reference computes per document
(/root/reference/seq2rel_ds/common/schemas.py:19-133 and
/root/reference/seq2rel_ds/common/util.py:114-229).  The DataFrame operators
in ``seq2rel_ds_spark.operators`` implement the same math as Catalyst
expressions; this module is the ground truth they are tested against, and the
implementation used inside Arrow-batched UDF fallbacks.

Where the reference relies on Python's *stable* sorts applied in multiple
passes, this module uses single composite sort keys that are provably
equivalent (see ``relation_sort_key``) — the same keys the Spark operators
use, since Spark sorts are not stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from seq2rel_ds_spark.core.text import normalize_ws

COREF_SEP = ";"
HINT_SEP = "[SEP]"
UNGROUNDED = "-1"


@dataclass
class Member:
    """One mention occurrence inside a coreference cluster."""

    start: int
    end: int
    surface: str
    seq: int  # global first-appearance order within the document (see parse)

    @property
    def span_weight(self) -> int:
        # The reference orders mentions by sum((start, end)) — schemas.py:35.
        return self.start + self.end


@dataclass
class Cluster:
    """A grounded entity = coreference cluster keyed by its KB uid."""

    uid: str
    label: str
    members: List[Member] = field(default_factory=list)

    def ordered_members(self) -> List[Member]:
        # Composite key (span_weight, seq) == reference's stable sort by
        # span_weight over append order (schemas.py:34-35).
        return sorted(self.members, key=lambda m: (m.span_weight, m.seq))

    def first_span(self) -> Tuple[int, int]:
        # min(..., key=sum) keeps the earliest-appended tie — schemas.py:46-48.
        m = self.ordered_members()[0]
        return (m.start, m.end)

    def to_string(self) -> str:
        forms = [normalize_ws(m.surface, lowercase=True) for m in self.ordered_members()]
        uniq = list(dict.fromkeys(forms))  # order-preserving, case already folded
        coref = f" {COREF_SEP} ".join(uniq)
        return f"{coref.strip()} @{self.label.strip().upper()}@"


@dataclass
class Document:
    doc_id: str
    text: str
    # insertion order of clusters == first-appearance order (dict semantics in
    # the reference, util.py:211-217); we keep an explicit ordered list.
    clusters: List[Cluster] = field(default_factory=list)
    relations: List[Tuple[Tuple[str, ...], str]] = field(default_factory=list)
    filtered_relations: Optional[List[Tuple[Tuple[str, ...], str]]] = None

    def cluster_map(self) -> Dict[str, Cluster]:
        return {c.uid: c for c in self.clusters}

    def hinted_text(self) -> str:
        """Entity hints prepended to the text — schemas.py:62-80."""
        keyed = []
        for idx, c in enumerate(self.clusters):
            s, e = c.first_span()
            keyed.append(((s + e, idx), c.to_string()))
        keyed.sort(key=lambda kv: kv[0])
        strings = list(dict.fromkeys(s for _, s in keyed))
        hint = f"{' '.join(strings).strip()} {HINT_SEP}"
        return f"{hint.strip()} {self.text.strip()}"

    def relation_strings(self) -> List[str]:
        """Linearized relations in reference order — schemas.py:82-133."""
        by_uid = self.cluster_map()
        keyed = []
        for idx, (uids, label) in enumerate(self.relations):
            rel_str = normalize_ws(
                " ".join(by_uid[u].to_string() for u in uids) + f" @{label.upper()}@"
            )
            offs = [sum(by_uid[u].first_span()) for u in uids]
            keyed.append((relation_sort_key(offs, idx), rel_str))
        keyed.sort(key=lambda kv: kv[0])
        return list(dict.fromkeys(s for _, s in keyed))

    def to_string(self) -> str:
        out = " ".join(self.relation_strings()).strip()
        if self.filtered_relations is not None:
            by_uid = self.cluster_map()
            if self.filtered_relations:
                fstrs = [
                    normalize_ws(
                        " ".join(by_uid[u].to_string() for u in uids) + f" @{label.upper()}@"
                    )
                    for uids, label in self.filtered_relations
                ]
            else:
                fstrs = ["null"]
            out = f"{out}\t{' '.join(fstrs).strip()}"
        return out

    def linearize(self, hints: bool = False) -> str:
        """One output line: ``text \\t relation_string`` (util.py:278-280)."""
        text = self.hinted_text() if hints else self.text
        return f"{text.strip()}\t{self.to_string().strip()}"


def document_to_dict(doc: Document) -> dict:
    """JSON-ready dict in the reference's serialized shape
    (schemas.py:136-147: Pydantic ``.dict()`` via the custom encoder)."""
    return {
        "pmid": doc.doc_id,
        "text": doc.text,
        "entities": {
            c.uid: {
                "mentions": [m.surface for m in c.members],
                "offsets": [(m.start, m.end) for m in c.members],
                "label": c.label,
            }
            for c in doc.clusters
        },
        "relations": [list(uids) + [label] for uids, label in doc.relations],
        "filtered_relations": (
            None
            if doc.filtered_relations is None
            else [list(uids) + [label] for uids, label in doc.filtered_relations]
        ),
    }


def document_from_dict(dct: dict) -> Document:
    """Inverse of document_to_dict (schemas.py:149-155 object_hook parity).

    Mention ``seq`` is reassigned by dict order — the serialized form keeps
    first-appearance order, exactly like the reference's round trip.
    """
    doc = Document(doc_id=dct["pmid"], text=dct["text"])
    seq = 0
    for uid, ent in dct.get("entities", {}).items():
        cluster = Cluster(uid=uid, label=ent["label"])
        for surface, (start, end) in zip(ent["mentions"], ent["offsets"]):
            cluster.members.append(Member(start=start, end=end, surface=surface, seq=seq))
            seq += 1
        doc.clusters.append(cluster)
    for rel in dct.get("relations", []):
        doc.relations.append((tuple(rel[:-1]), rel[-1]))
    fr = dct.get("filtered_relations")
    if fr is not None:
        doc.filtered_relations = [(tuple(r[:-1]), r[-1]) for r in fr]
    return doc


def relation_sort_key(offs: Sequence[int], insertion_idx: int) -> Tuple[int, ...]:
    """Composite key equivalent to the reference's multi-pass stable sort.

    The reference (schemas.py:110-123) stable-sorts relations first by
    ``sum(offs)``, then once per entity position i in 0..n-2 by ``offs[i]``.
    A sequence of stable sorts is equivalent to one lexicographic sort whose
    primary key is the LAST pass's key; earlier passes act as tie-breakers in
    reverse order, with the original insertion index as the final tie-break:

        (offs[n-2], offs[n-3], ..., offs[0], sum(offs), insertion_idx)
    """
    n = len(offs)
    return tuple(reversed(offs[: n - 1])) + (sum(offs), insertion_idx)
