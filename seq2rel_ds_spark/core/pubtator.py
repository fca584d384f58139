"""Pure-Python PubTator block parser (reference parity of
/root/reference/seq2rel_ds/common/util.py:114-229).

Used (a) by the fixture generator / differential tests as an independent
oracle and (b) inside the Arrow-batched UDF of the streaming source where a
whole document block arrives as one string.  The batch engine's primary path
is the Catalyst decomposition in ``seq2rel_ds_spark.operators.parse`` — this
module is the per-document ground truth it must agree with.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from seq2rel_ds_spark.core.model import Cluster, Document, Member, UNGROUNDED
from seq2rel_ds_spark.core.text import bounded_word_search

TEXT_SEGMENTS = ("title", "abstract", "both")


def is_mention_line(cols: List[str]) -> bool:
    """Mention lines carry integer start/end in columns 1-2
    (sorting_utils.py:5-21); relation lines carry the label there."""
    if len(cols) < 3:
        return False
    try:
        int(cols[1])
        int(cols[2])
        return True
    except ValueError:
        return False


def segment_text(title: str, abstract: str, text_segment: str) -> Optional[str]:
    """Pick the working text for a document (util.py:151-162).

    Returns None where the reference raises (abstract requested but absent) —
    the caller decides whether to raise or drop (at web scale we drop+count).
    """
    if text_segment == "both":
        return f"{title} {abstract}" if abstract else title
    if text_segment == "title":
        return title
    if not abstract:
        return None
    return abstract


def parse_block(
    block: str,
    text_segment: str = "both",
    skip_malformed: bool = False,
) -> Document:
    """Parse one blank-line-separated PubTator document block."""
    assert text_segment in TEXT_SEGMENTS
    lines = block.strip().split("\n")
    pmid, title = lines[0].split("|t|")
    abstract = lines[1].split("|a|")[-1].strip()
    title = title.strip()

    text = segment_text(title, abstract, text_segment)
    if text is None:
        raise ValueError(
            f"text_segment was {text_segment} but no abstract was found"
        )

    raw = [ln.strip().split("\t") for ln in lines[2:] if ln.strip()]
    mention_lines = [c for c in raw if is_mention_line(c)]
    relation_lines = [c for c in raw if not is_mention_line(c)]
    # Stable sort by end offset == reference's first-appearance ordering of
    # annotation lines (sorting_utils.py:24-33); composite (end, input order).
    mention_lines = sorted(
        enumerate(mention_lines), key=lambda ic: (int(ic[1][2]), ic[0])
    )

    doc = Document(doc_id=pmid, text=text)
    by_uid = {}
    seq = 0
    for _, cols in mention_lines:
        if len(cols) == 6:
            _, start_s, end_s, mentions_s, label, uids_s = cols
        elif len(cols) == 7:
            # compound form: column 3 is the full compound surface, the
            # member surfaces arrive in the trailing column (util.py:176).
            _, start_s, end_s, _, label, uids_s, mentions_s = cols
        else:
            if skip_malformed:
                continue
            raise ValueError(
                f"Found an annotation with an unexpected number of columns: "
                f"{chr(9).join(cols)}"
            )
        start, end = int(start_s), int(end_s)

        # Section filter (util.py:188-190): a mention belongs to the title iff
        # it starts before the title's end; offsets are document-level.
        section = "title" if start < len(title) else "abstract"
        if text_segment != "both" and section != text_segment:
            continue

        surfaces, uids = mentions_s.split("|"), uids_s.split("|")
        compound = len(surfaces) > 1
        for surface, uid in zip(surfaces, uids):
            if uid == UNGROUNDED:  # util.py:198-201
                continue
            m_start, m_end = start, end
            if compound:
                # Re-anchor the member inside the compound span (util.py:205-209).
                span = bounded_word_search(surface, text, lo=start, hi=end)
                if span is not None:
                    m_start, m_end = span
            member = Member(start=m_start, end=m_end, surface=surface, seq=seq)
            seq += 1
            if uid in by_uid:
                by_uid[uid].members.append(member)
            else:
                cluster = Cluster(uid=uid, label=label)
                cluster.members.append(member)
                by_uid[uid] = cluster
                doc.clusters.append(cluster)

    seen = set()
    for cols in relation_lines:
        _, label, *uids = cols
        key = (tuple(uids), label)
        if key not in seen and all(u in by_uid for u in uids):
            seen.add(key)
            doc.relations.append(key)
    return doc


def parse_corpus(
    content: str, text_segment: str = "both", skip_malformed: bool = False
) -> List[Document]:
    """Parse a whole PubTator corpus string (documents split on blank lines)."""
    return [
        parse_block(b, text_segment, skip_malformed)
        for b in content.strip().split("\n\n")
    ]


def split_title_line(line: str) -> Tuple[str, str]:
    pmid, title = line.split("|t|")
    return pmid, title.strip()
