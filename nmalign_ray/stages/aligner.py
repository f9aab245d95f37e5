"""Aligner actor-pool stage: chunk rows -> aligned span rows.

A callable CLASS for ``Dataset.map_batches(AlignChunks, concurrency=N,
...)``: configuration (normalization program, thresholds) is parsed and
the regex program compiled ONCE per actor in ``__init__``; ``__call__``
then runs the per-chunk alignment kernel (``document.align_chunk`` — the
same function the serial oracle uses, which is what guarantees fixture
parity).  This is the stateful counterpart of the reference's per-page
``align.match`` invocation (``/root/reference/nmalign/ocrd/cli.py:227-234``,
``workers=1`` per page — here each actor is one such worker and the pool
replaces page-level multiprocessing).
"""

from __future__ import annotations

import pyarrow as pa

from ..align.core import AlignConfig, make_preprocessor
from ..document import align_chunk
from ..schema import SPAN_TYPE

ALIGNED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("salt", pa.int32()),
        ("out_spans", pa.list_(SPAN_TYPE)),
        ("media", pa.list_(SPAN_TYPE)),
        ("matched", pa.int32()),
        ("total", pa.int32()),
        ("score_sum", pa.float64()),
        ("unmatched_cands", pa.int32()),
    ]
)


class AlignChunks:
    def __init__(self, config: AlignConfig | None = None):
        self.config = config if config is not None else AlignConfig()
        # warm the compiled-regex cache once per actor
        make_preprocessor(self.config.normalization)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in ALIGNED_SCHEMA.names}
        doc_ids = batch["doc_id"].to_pylist()
        salts = batch["salt"].to_pylist()
        cand_kinds = batch["cand_kind"].to_pylist()
        cand_texts = batch["cand_text"].to_pylist()
        ref_texts = batch["ref_text"].to_pylist()
        ref_offsets = batch["ref_offset"].to_pylist()
        media = batch["media"].to_pylist()
        for k in range(batch.num_rows):
            out, matched, score_sum, unmatched = align_chunk(
                ref_texts[k], ref_offsets[k], cand_kinds[k], cand_texts[k],
                self.config,
            )
            rows["doc_id"].append(doc_ids[k])
            rows["salt"].append(salts[k])
            rows["out_spans"].append(out)
            rows["media"].append(media[k] or [])
            rows["matched"].append(matched)
            rows["total"].append(len(ref_texts[k]))
            rows["score_sum"].append(score_sum)
            rows["unmatched_cands"].append(unmatched)
        return pa.Table.from_pydict(rows, schema=ALIGNED_SCHEMA)
