"""Sources: corpus readers that normalize every input shape into the engine's
document DataFrame (doc_id, title, abstract, ann_lines) plus dimension tables.
"""
