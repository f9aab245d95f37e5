"""Reassembly stage: merge a document's aligned chunks by offset.

The ``groupby(doc_id).map_groups`` shuffle of the north star: salted
chunk outputs and media markers of one document meet here, are merged
and sorted by ``offset`` (the in-group sort replaces a global
``Dataset.sort`` — groups are small, SURVEY §4.2), and the reference's
global-stats reduction (``mp.Manager`` dict,
``/root/reference/nmalign/ocrd/cli.py:110-118``) becomes per-document
metric columns aggregated downstream by dataflow.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import OUTPUT_SCHEMA


def reassemble_group(group: pa.Table) -> pa.Table:
    # one to_pylist per column, never a per-cell as_py (each as_py
    # indexing builds an Arrow scalar object — measured ~10x slower on
    # this, the headline, path)
    salts = group["salt"].to_pylist()
    media_col = group["media"].to_pylist()
    spans_col = group["out_spans"].to_pylist()
    matched_col = group["matched"].to_pylist()
    total_col = group["total"].to_pylist()
    score_col = group["score_sum"].to_pylist()
    unmatched_col = group["unmatched_cands"].to_pylist()
    order = sorted(range(group.num_rows), key=lambda k: salts[k])
    spans = []
    score_sum = 0.0
    for k in order:
        spans.extend(media_col[k] or [])
        spans.extend(spans_col[k] or [])
        score_sum += score_col[k]  # accumulate in salt order: float sums
        # are order-sensitive and the serial oracle sums in chunk order
    spans.sort(key=lambda s: s["offset"])
    matched = sum(matched_col)
    return pa.Table.from_pydict(
        {
            "doc_id": group["doc_id"].to_pylist()[:1],
            "spans": [spans],
            "mean_score": [score_sum / matched if matched else 0.0],
            "matched": [matched],
            "total": [sum(total_col)],
            "unmatched_ref_count": [sum(unmatched_col)],
        },
        schema=OUTPUT_SCHEMA,
    )
