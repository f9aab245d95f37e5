"""Document-level text rollup (the reference's upward text propagation O10).

``page_update_higher_textequiv_levels`` concatenates text bottom-up with
order semantics — lines joined by newline into regions, confidences
averaged at each level (``/root/reference/nmalign/ocrd/cli.py:327-439``).
In the span model the hierarchy is flat, so the rollup is: matched text
spans of a document, in output order, joined by ``"\\n"``; media spans
contribute a placeholder reference line; the document confidence is the
mean span score (already carried as ``mean_score``).

The reference's ``Relation type=join`` (concatenate WITHOUT the line
separator, ``/root/reference/nmalign/ocrd/cli.py:354-358``) maps to a
per-span attribute encoded in the ``kind`` column: a span whose kind
carries the ``+join`` suffix (e.g. ``"text+join"``) is appended to the
preceding fragment with no separator.  RTL / bottom-to-top reversal has
no counterpart (order is explicit via ``offset``) and stays out of
model.
"""

from __future__ import annotations

import pyarrow as pa

ROLLUP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.string()),
        ("n_spans", pa.int32()),
        ("mean_score", pa.float64()),
    ]
)

# kind suffix marking a span that joins the previous fragment without a
# separator (the columnar form of Relation type=join)
JOIN_SUFFIX = "+join"


def rollup_spans(spans: list[dict]) -> str:
    parts = []
    for s in spans:
        kind = s.get("kind") or ""
        joined = kind.endswith(JOIN_SUFFIX)
        if s["media_ref"]:
            frag = f"[{kind.removesuffix(JOIN_SUFFIX)}:{s['media_ref']}]"
        elif s["text"]:
            frag = s["text"]
        else:
            continue
        if joined and parts:
            parts[-1] += frag
        else:
            parts.append(frag)
    return "\n".join(parts)


def rollup_batch(batch: pa.Table) -> pa.Table:
    rows = {"doc_id": [], "text": [], "n_spans": [], "mean_score": []}
    for did, spans, score in zip(
        batch["doc_id"].to_pylist(),
        batch["spans"].to_pylist(),
        batch["mean_score"].to_pylist(),
    ):
        rows["doc_id"].append(did)
        rows["text"].append(rollup_spans(spans or []))
        rows["n_spans"].append(len(spans or []))
        rows["mean_score"].append(score)
    return pa.Table.from_pydict(rows, schema=ROLLUP_SCHEMA)


def rollup_documents(out_ds):
    """OUTPUT_SCHEMA dataset -> one text row per document."""
    return out_ds.map_batches(rollup_batch, batch_format="pyarrow")
