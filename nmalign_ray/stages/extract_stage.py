"""Stateless extract+salt stage: documents -> alignment chunk rows.

One input row (``doc_id, spans, ref_spans``) becomes one or more chunk
rows — documents whose candidate count exceeds the salt threshold are
split into contiguous ``(doc_id, salt)`` windows (north rule skew
handling; SURVEY §4.2) so no single alignment call exceeds the bound and
oversized documents load-balance across the aligner actor pool instead
of straggling one worker (the reference holds a whole page in RAM
instead, ``/root/reference/nmalign/lib/align.py:60-61``).

This stage is pure and cheap relative to alignment, so it runs as
stateless Ray tasks with a large batch size.  The per-document work
(DOM parsing, layout re-sort) is inherently row-wise; the engine's
vectorization budget is spent where it matters — the alignment DP —
while this stage's batches stay zero-copy Arrow in/out.
"""

from __future__ import annotations

import pyarrow as pa

from ..document import salt_chunks
from ..extract import classify_spans
from ..schema import MEDIA_KINDS, SPAN_TYPE

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("salt", pa.int32()),
        ("cand_kind", pa.list_(pa.string())),
        ("cand_text", pa.list_(pa.string())),
        ("ref_text", pa.list_(pa.string())),
        ("ref_offset", pa.list_(pa.int32())),
        # media markers ride on salt 0 only (they skip alignment)
        ("media", pa.list_(SPAN_TYPE)),
    ]
)


def extract_and_salt(batch: pa.Table, salt_threshold: int = 256) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    refs_col = batch["ref_spans"].to_pylist()

    rows = {name: [] for name in CHUNK_SCHEMA.names}
    for did, spans, ref_spans in zip(doc_ids, spans_col, refs_col):
        spans = spans or []
        ref_spans = ref_spans or []
        candidates, media = classify_spans(
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        refs = [
            r for r in ref_spans
            if r["kind"] not in MEDIA_KINDS and not (r["media_ref"] and not r["text"])
        ]
        refs.sort(key=lambda r: r["offset"])
        media_dicts = [
            {"kind": m.kind, "text": "", "media_ref": m.media_ref, "offset": m.offset}
            for m in media
        ]
        for salt, (c_lo, c_hi, r_lo, r_hi) in enumerate(
            salt_chunks(len(candidates), len(refs), salt_threshold)
        ):
            rows["doc_id"].append(did)
            rows["salt"].append(salt)
            rows["cand_kind"].append([c.kind for c in candidates[c_lo:c_hi]])
            rows["cand_text"].append([c.text for c in candidates[c_lo:c_hi]])
            rows["ref_text"].append([r["text"] for r in refs[r_lo:r_hi]])
            rows["ref_offset"].append([r["offset"] for r in refs[r_lo:r_hi]])
            rows["media"].append(media_dicts if salt == 0 else [])
    return pa.Table.from_pydict(rows, schema=CHUNK_SCHEMA)
