"""Text analysis operators: normalize, tokens, quality, language-ID, fingerprint.

All per-document transforms are single stateless ``map_batches`` passes,
fully vectorized with pyarrow.compute / numpy (token membership tests run
on the FLATTENED token array once, then segment-sum back per document via
``np.add.reduceat`` — no per-row Python).  Each operator has an exact
DuckDB twin (the ``*_SQL`` constants) used as the correctness oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# deterministic, tiny stoplists (parity with the SQL oracles matters, not
# linguistic quality)
STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von"),
    "en": ("the", "and", "of", "a", "to", "is", "in", "it"),
    "es": ("el", "los", "y", "es", "de", "que", "en", "un"),
    "fr": ("le", "les", "et", "est", "un", "une", "dans", "que"),
}
PUNCT_CLASS = r"[.,;:!?]"
# BPE-ish token regex: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens_and_offsets(texts: pa.ChunkedArray | pa.Array):
    """Whitespace tokens of trimmed text as (flat_tokens, doc_boundaries)."""
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    # empty text yields one empty-string token after split; count it as 0
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    counts = np.where(empty, 0, counts)
    flat = pc.list_flatten(toks)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(toks).to_numpy(zero_copy_only=False),
              out=offsets[1:])
    return flat, offsets, counts


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero (DuckDB's round semantics; numpy/pandas
    round half-to-even and diverge at exact .5 boundaries, e.g. k/128
    ratios or binary-exact sums).  Sign-aware."""
    arr = np.asarray(x, dtype=np.float64)
    k = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * k + 0.5) / k


def round6(x) -> np.ndarray:
    return round_half_away(x, 6)


def _segment_count(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum a boolean mask over the flat-token array per document segment."""
    if len(mask) == 0:
        return np.zeros(len(offsets) - 1, dtype=np.int64)
    cums = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
    return cums[offsets[1:]] - cums[offsets[:-1]]


NORMALIZE_SQL = """
SELECT doc_id,
       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
FROM documents
"""


def normalize_batch(batch: pa.Table) -> pa.Table:
    """The engine's stateless normalize operator (reference A2,
    ``/root/reference/nmalign/lib/align.py:54-59``) in its SQL-checkable
    form: lowercase + whitespace collapse (NFKC has no DuckDB twin; the
    full regex+NFKC program runs inside the aligner via
    ``make_preprocessor``)."""
    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"])), r"\s+", " "
    )
    return pa.Table.from_arrays([batch["doc_id"], norm], ["doc_id", "norm_text"])


def normalize_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(normalize_batch, batch_format="pyarrow")


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens
FROM documents
"""


def token_count_batch(batch: pa.Table) -> pa.Table:
    _, _, counts = _tokens_and_offsets(batch["text"])
    bpe = pc.count_substring_regex(batch["text"], BPE_TOKEN_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, type=pa.int64()),
            "n_bpe_tokens": pa.array(bpe, type=pa.int64()),
        }
    )


def token_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

QUALITY_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       round(CASE WHEN trim(text) = '' THEN 0.0 ELSE
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> t IN ({_EN})))
         / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) END, 6)
         AS stop_ratio,
       round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
         / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio,
       (CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
        BETWEEN 5 AND 10000)
       AND round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
         / CAST(length(text) AS DOUBLE) END, 6) < 0.2 AS quality_ok
FROM documents
"""


def quality_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offsets, counts = _tokens_and_offsets(pc.utf8_lower(text))
    stop_hits = _segment_count(
        pc.is_in(flat, value_set=pa.array(STOPWORDS["en"])).to_numpy(
            zero_copy_only=False
        ),
        offsets,
    )
    stop_ratio = round6(
        np.where(counts > 0, stop_hits / np.maximum(counts, 1), 0.0)
    )
    punct = pc.utf8_length(
        pc.replace_substring_regex(text, "[^.,;:!?]", "")
    ).to_numpy(zero_copy_only=False)
    punct_ratio = round6(
        np.where(n_chars > 0, punct / np.maximum(n_chars, 1), 0.0)
    )
    quality_ok = ((counts >= 5) & (counts <= 10000)) & (punct_ratio < 0.2)
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(counts.astype(np.int64)),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "quality_ok": pa.array(quality_ok),
        }
    )


def quality_scores(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"t -> t IN ({words}))) END"
    )


LANG_ID_SQL = f"""
SELECT doc_id,
       CASE
         WHEN greatest({_lang_hits_sql('de')}, {_lang_hits_sql('en')},
                       {_lang_hits_sql('es')}, {_lang_hits_sql('fr')}) = 0
           THEN 'und'
         WHEN {_lang_hits_sql('de')} >= {_lang_hits_sql('en')}
          AND {_lang_hits_sql('de')} >= {_lang_hits_sql('es')}
          AND {_lang_hits_sql('de')} >= {_lang_hits_sql('fr')} THEN 'de'
         WHEN {_lang_hits_sql('en')} >= {_lang_hits_sql('es')}
          AND {_lang_hits_sql('en')} >= {_lang_hits_sql('fr')} THEN 'en'
         WHEN {_lang_hits_sql('es')} >= {_lang_hits_sql('fr')} THEN 'es'
         ELSE 'fr'
       END AS pred_lang
FROM documents
"""


def lang_id_batch(batch: pa.Table) -> pa.Table:
    flat, offsets, counts = _tokens_and_offsets(pc.utf8_lower(batch["text"]))
    hits = {}
    for lang, words in STOPWORDS.items():
        mask = pc.is_in(flat, value_set=pa.array(words)).to_numpy(
            zero_copy_only=False
        )
        hits[lang] = _segment_count(mask, offsets)
    de, en, es, fr = hits["de"], hits["en"], hits["es"], hits["fr"]
    pred = np.where(
        np.maximum.reduce([de, en, es, fr]) == 0,
        "und",
        np.where(
            (de >= en) & (de >= es) & (de >= fr),
            "de",
            np.where((en >= es) & (en >= fr), "en", np.where(es >= fr, "es", "fr")),
        ),
    )
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "pred_lang": pa.array(pred.tolist())}
    )


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """N-gram/stopword-heuristic language identification (deterministic
    argmax with fixed de>en>es>fr tie order)."""
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"])), r"\s+", " "
    )
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm.to_pylist()]
    return pa.Table.from_pydict({"doc_id": batch["doc_id"], "fingerprint": fps})


def fingerprints(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Content fingerprint (md5 of normalized text) — the exact-dedup key
    and the SQL-checkable stand-in for a rolling hash."""
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


QUALITY_FILTER_SQL = f"""
SELECT doc_id, length(text) AS n_chars
FROM documents
WHERE (CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       BETWEEN 5 AND 10000)
  AND round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
        length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        / CAST(length(text) AS DOUBLE) END, 6) < 0.2
"""


def quality_filter(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Training-data quality gate: keep only documents passing the quality
    heuristics (filter pushed into the same vectorized pass)."""

    def keep(batch: pa.Table) -> pa.Table:
        scored = quality_batch(batch)
        mask = scored["quality_ok"]
        return pa.Table.from_pydict(
            {
                "doc_id": pc.filter(scored["doc_id"], mask),
                "n_chars": pc.filter(scored["n_chars"], mask),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


TOP_TERMS_K = 20

TOP_TERMS_SQL = f"""
SELECT t AS term, count(*) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
)
GROUP BY t
ORDER BY cnt DESC, term
LIMIT {TOP_TERMS_K}
"""


def top_terms(ds: ray.data.Dataset, k: int = TOP_TERMS_K) -> ray.data.Dataset:
    """Corpus-level top-k term frequencies — the canonical
    partial-pre-aggregation shape: each batch collapses its tokens into
    (term, cnt) partial counts BEFORE the shuffle, so the global
    ``groupby(term)`` exchange moves one row per distinct term per batch
    (vocabulary-sized), never one row per token (corpus-sized).  The
    final top-k cut orders by (cnt DESC, term ASC) — the SQL twin's
    total order — over the distinct-term aggregate, which is
    vocabulary-small by construction."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = text.strip().lower().split()
            counts.update(toks)
        return pa.Table.from_pydict(
            {"term": pa.array(list(counts.keys()), pa.string()),
             "cnt": pa.array(list(counts.values()), pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "term"
    ).aggregate(Sum("cnt", alias_name="cnt"))

    def cut(df):
        out = df.sort_values(["cnt", "term"], ascending=[False, True]).head(k)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out.reset_index(drop=True)

    # the aggregate is vocabulary-sized (tiny); one driver-side cut
    return ray.data.from_pandas(cut(agg.to_pandas()))


HASH_SAMPLE_MOD = 5

HASH_SAMPLE_SQL = f"""
SELECT doc_id, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      % {HASH_SAMPLE_MOD} = 0
"""


def hash_sample(ds: ray.data.Dataset, mod: int = HASH_SAMPLE_MOD) -> ray.data.Dataset:
    """Deterministic hash-based sampling (keep doc iff
    md5(doc_id) % mod == 0): the reproducible subsampling primitive a
    training-data pipeline needs — stable across runs, machines and
    partitionings, unlike ``Dataset.random_sample``.  Stateless
    map-side filter; no shuffle."""
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        mask = pa.array(
            [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % mod == 0
             for d in ids],
            type=pa.bool_(),
        )
        return pa.Table.from_pydict(
            {"doc_id": pc.filter(batch["doc_id"], mask),
             "n_chars": pc.filter(batch["n_chars"], mask)}
        )

    return ds.map_batches(keep, batch_format="pyarrow")
