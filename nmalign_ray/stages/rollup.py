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
preceding fragment with no separator.

The reference's ``textLineOrder=bottom-to-top`` reversal
(``lines = list(reversed(lines))``,
``/root/reference/nmalign/ocrd/cli.py:390-393``) maps to the explicit
``bottom_to_top`` rollup option: span order is reversed per document
before joining.

The reference's ``readingDirection=RIGHTTOLEFT`` handling
(``/root/reference/nmalign/ocrd/cli.py:396-410``) reverses the WORD
order within a line (words re-joined by ``' '``) and the GLYPH order
within each word (glyphs re-joined by ``''``); a page-level RTL flag
triggers both.  The columnar counterpart is the ``rtl`` rollup option:
each text span's words are reversed and each word's characters are
reversed (media placeholder fragments are references, not text, and
pass through unreversed).
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


def rollup_spans(spans: list[dict], bottom_to_top: bool = False,
                 rtl: bool = False) -> str:
    parts = []
    if bottom_to_top:
        spans = list(reversed(spans))
    for s in spans:
        kind = s.get("kind") or ""
        joined = kind.endswith(JOIN_SUFFIX)
        if s["media_ref"]:
            frag = f"[{kind.removesuffix(JOIN_SUFFIX)}:{s['media_ref']}]"
        elif s["text"]:
            frag = s["text"]
            if rtl:
                # page-level RIGHTTOLEFT: reversed word order within the
                # line AND reversed glyph order within each word —
                # ' '.split is the faithful inverse of the reference's
                # ' '.join over words (ocrd/cli.py:396-418)
                frag = " ".join(w[::-1] for w in reversed(frag.split(" ")))
        else:
            continue
        if joined and parts:
            parts[-1] += frag
        else:
            parts.append(frag)
    return "\n".join(parts)


def rollup_batch(batch: pa.Table, bottom_to_top: bool = False,
                 rtl: bool = False) -> pa.Table:
    rows = {"doc_id": [], "text": [], "n_spans": [], "mean_score": []}
    for did, spans, score in zip(
        batch["doc_id"].to_pylist(),
        batch["spans"].to_pylist(),
        batch["mean_score"].to_pylist(),
    ):
        rows["doc_id"].append(did)
        rows["text"].append(rollup_spans(spans or [], bottom_to_top, rtl))
        rows["n_spans"].append(len(spans or []))
        rows["mean_score"].append(score)
    return pa.Table.from_pydict(rows, schema=ROLLUP_SCHEMA)


def rollup_documents(out_ds, bottom_to_top: bool = False,
                     rtl: bool = False):
    """OUTPUT_SCHEMA dataset -> one text row per document.

    ``bottom_to_top=True`` reverses each document's span order before
    joining — the columnar counterpart of the reference's
    ``textLineOrder=bottom-to-top`` traversal.  ``rtl=True`` reverses
    word order within each text span and glyph order within each word —
    the page-level ``readingDirection=RIGHTTOLEFT`` semantics."""
    from functools import partial

    return out_ds.map_batches(
        partial(rollup_batch, bottom_to_top=bottom_to_top, rtl=rtl),
        batch_format="pyarrow")
