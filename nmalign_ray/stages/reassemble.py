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
    order = sorted(range(group.num_rows), key=lambda k: group["salt"][k].as_py())
    spans = []
    matched = 0
    total = 0
    score_sum = 0.0
    unmatched = 0
    for k in order:
        spans.extend(group["media"][k].as_py() or [])
        spans.extend(group["out_spans"][k].as_py() or [])
        matched += group["matched"][k].as_py()
        total += group["total"][k].as_py()
        score_sum += group["score_sum"][k].as_py()
        unmatched += group["unmatched_cands"][k].as_py()
    spans.sort(key=lambda s: s["offset"])
    return pa.Table.from_pydict(
        {
            "doc_id": [group["doc_id"][0].as_py()],
            "spans": [spans],
            "mean_score": [score_sum / matched if matched else 0.0],
            "matched": [matched],
            "total": [total],
            "unmatched_ref_count": [unmatched],
        },
        schema=OUTPUT_SCHEMA,
    )
