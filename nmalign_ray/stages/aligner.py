"""Aligner stage: chunk rows -> aligned span rows (tasks or actor pool).

Two physical forms over the same kernel (``document.align_chunk`` — the
function the serial oracle uses, which is what guarantees fixture
parity):

* ``align_chunks_batch`` — the TASK form and the round-4 default.  The
  stage's only "state" is the compiled regex program, and
  ``make_preprocessor`` caches compiled patterns per PROCESS; Ray task
  workers are reused processes, so the warm-once property holds with
  zero pool semantics.  A/B at sf0.1/32cpu: the checkpointed headline
  ran 13.7-14.4 s as tasks vs 16.3-23.3 s with a cpus-2 actor pool
  (pool creation reserves CPUs up front and actor startup/churn
  dominates; tasks also removed the intermittent 15-20 s stalls between
  back-to-back pipelines — 10 family queries: 21 s as tasks vs 64-87 s
  as pools).
* ``AlignChunks`` — the callable-CLASS form for
  ``map_batches(AlignChunks, concurrency=N)``, kept for stages whose
  per-actor setup is genuinely heavy (model checkpoints, large
  lookups); selected via ``EngineConfig.align_mode='actors'`` or an
  explicit ``align_concurrency``.

This is the counterpart of the reference's per-page ``align.match``
invocation (``/root/reference/nmalign/ocrd/cli.py:227-234``,
``workers=1`` per page — each worker processes one chunk row; Ray task
scheduling replaces page-level multiprocessing).
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


def align_chunks_batch(batch: pa.Table, config: AlignConfig | None = None
                       ) -> pa.Table:
    """Task-form aligner (the default; see module docstring)."""
    return AlignChunks(config)(batch)
