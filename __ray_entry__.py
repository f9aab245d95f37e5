"""Driver contract for the nmalign_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here
calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship extraction pipeline on sf0.001.
* ``queries()`` — one callable per implemented operator (SURVEY §2 +
  the training-data operator suite); each takes ``sf_dir``.
* ``oracle_sql()`` — exact DuckDB twin for every SQL-expressible query
  (same column names); alignment / sketch / ANN operators are
  non-SQL-expressible and get rows-only checks.

The interleaved corpus required by the alignment queries does not exist
in the test data, so it is DERIVED deterministically from the
``documents`` table (sentence segmentation -> per-family corruption,
seeded per doc_id — see ``nmalign_ray.corpus.corpus_from_documents``)
and cached as parquet under /tmp per scale factor.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

# make the package importable regardless of the driver's cwd/sys.path
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# bump _GEN_VERSION whenever corpus derivation changes — it keys the /tmp
# cache so stale corpora from older code can never leak into a run
_GEN_VERSION = "v1"
_CACHE_ROOT = f"/tmp/nmalign_ray_cache/{_GEN_VERSION}"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def derived_corpus(sf_dir: str, families=None):
    """Interleaved corpus derived from the documents table; generated
    distributed (map_batches) and cached as parquet per (sf_dir, family
    mix).  The tmp dir is pid-suffixed so concurrent processes cannot
    collide; the rename is atomic either way."""
    import ray.data

    from nmalign_ray.corpus import FAMILIES, corpus_from_documents

    fams = tuple(families) if families else FAMILIES
    tag = os.path.basename(os.path.normpath(sf_dir))
    fam_tag = "corpus" if fams == FAMILIES else "corpus-" + "-".join(fams)
    cache = os.path.join(_CACHE_ROOT, tag, fam_tag)
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

        def gen(batch: pa.Table) -> pa.Table:
            return corpus_from_documents(
                batch["text"].to_pylist(), batch["doc_id"].to_pylist(),
                families=fams,
            )

        tmp = f"{cache}.tmp.{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        docs.map_batches(gen, batch_format="pyarrow").write_parquet(tmp)
        # write the marker INSIDE tmp so data + marker publish atomically
        # with the rename (a crash between rename and a later marker write
        # would leave a complete-but-unmarked cache that every future run
        # tries and fails to regenerate over)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        # publish without ever deleting an existing cache (another process
        # may have won the race and readers may be mid-scan): first rename
        # wins, losers discard their tmp
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return ray.data.read_parquet(
        [os.path.join(cache, f) for f in sorted(os.listdir(cache))
         if f.endswith(".parquet")]
    )


_FLAGSHIP_CACHE: dict[str, Any] = {}


def _flagship(sf_dir: str):
    """Flagship pipeline result, materialized once per (process, sf_dir):
    three queries project different views of the same output, so the
    driver's correctness sweep runs the alignment once, not three times.
    The materialized table is small (one row per document)."""
    import ray.data

    from nmalign_ray.pipelines import build_extract_pipeline
    from nmalign_ray.schema import EngineConfig

    cached = _FLAGSHIP_CACHE.get(sf_dir)
    if cached is None:
        out = build_extract_pipeline(derived_corpus(sf_dir), EngineConfig())
        cached = pa.concat_tables(
            [ray.get(r) for r in out.to_arrow_refs()]
        ).combine_chunks()
        _FLAGSHIP_CACHE[sf_dir] = cached
    return ray.data.from_arrow(cached)


def _explode_output(out_ds):
    """Flatten (doc_id, spans) to judged rows (doc_id, order, kind, text,
    media_ref) — the reference CLI's projection C3
    (/root/reference/nmalign/scripts/cli.py:93-122) in columnar form."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
        for did, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for s in spans:
                rows["doc_id"].append(did)
                rows["order"].append(s["offset"])
                rows["kind"].append(s["kind"])
                rows["text"].append(s["text"])
                rows["media_ref"].append(s["media_ref"])
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "order": pa.array(rows["order"], pa.int32()),
                "kind": pa.array(rows["kind"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
                "media_ref": pa.array(rows["media_ref"], pa.string()),
            }
        )

    return out_ds.map_batches(explode, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive the interleaved
    corpus, extract + force-align, return exploded span rows."""
    return _explode_output(_flagship("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    from nmalign_ray.functions import dedup, media, relational, simsearch, textstats
    from nmalign_ray.functions.textstats import round6

    def extract_align(sf_dir):
        return _explode_output(_flagship(sf_dir))

    def align_metrics(sf_dir):
        def project(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"],
                    "mean_score": pa.array(
                        round6(batch["mean_score"].to_numpy(zero_copy_only=False)),
                        pa.float64(),
                    ),
                    "matched": batch["matched"],
                    "total": batch["total"],
                    "unmatched_ref_count": batch["unmatched_ref_count"],
                }
            )

        return _flagship(sf_dir).map_batches(project, batch_format="pyarrow")

    def rollup_text(sf_dir):
        from nmalign_ray.stages import rollup_documents

        return rollup_documents(_flagship(sf_dir))

    def extract_align_identity(sf_dir):
        # the full distributed pipeline on the identity family, where the
        # expected output is SQL-reconstructible: every ref segment must
        # come back verbatim, in order — a HASH-VERIFIED end-to-end
        # alignment check, not just rows-only
        from nmalign_ray.pipelines import build_extract_pipeline
        from nmalign_ray.schema import EngineConfig

        out = build_extract_pipeline(
            derived_corpus(sf_dir, families=("identity",)), EngineConfig()
        )
        return _explode_output(out)

    return {
        # --- alignment / extraction (non-SQL; rows-only checks) ---
        "extract_align": extract_align,
        "align_metrics": align_metrics,
        "rollup_text": rollup_text,
        "extract_align_identity": extract_align_identity,
        # --- text analysis (SQL-verified) ---
        "normalize_docs": lambda sf: textstats.normalize_docs(_read(sf, "documents", ["doc_id", "text"])),
        "token_counts": lambda sf: textstats.token_counts(_read(sf, "documents", ["doc_id", "text"])),
        "quality_scores": lambda sf: textstats.quality_scores(_read(sf, "documents", ["doc_id", "text"])),
        "lang_id": lambda sf: textstats.lang_id(_read(sf, "documents", ["doc_id", "text"])),
        "fingerprints": lambda sf: textstats.fingerprints(_read(sf, "documents", ["doc_id", "text"])),
        "quality_filter": lambda sf: textstats.quality_filter(_read(sf, "documents", ["doc_id", "text"])),
        # --- dedup (exact + sample SQL-verified; sketches rows-only) ---
        "exact_dedup": lambda sf: dedup.exact_dedup(_read(sf, "documents", ["doc_id", "text"])),
        "dedup_keepers": lambda sf: dedup.dedup_keepers(_read(sf, "documents", ["doc_id", "text", "n_chars"])),
        "jaccard_sample": lambda sf: dedup.jaccard_sample(_read(sf, "documents", ["doc_id", "text"])),
        "minhash_near_dups": lambda sf: dedup.minhash_near_dups(_read(sf, "documents", ["doc_id", "text"])),
        "simhash_near_dups": lambda sf: dedup.simhash_near_dups(_read(sf, "documents", ["doc_id", "text"])),
        "dup_groups": lambda sf: dedup.connected_groups(
            dedup.minhash_near_dups(_read(sf, "documents", ["doc_id", "text"]))
        ),
        # --- similarity search (brute SQL-verified; ANN rows-only) ---
        "knn_brute": lambda sf: simsearch.knn_brute(_read(sf, "embeddings", ["vec_id", "embedding"])),
        "knn_lsh": lambda sf: simsearch.knn_lsh(_read(sf, "embeddings", ["vec_id", "embedding"])),
        "knn_ivf": lambda sf: simsearch.knn_ivf(_read(sf, "embeddings", ["vec_id", "embedding"])),
        "embedding_near_dups": lambda sf: simsearch.embedding_near_dups(
            simsearch.augment_with_planted(
                _read(sf, "embeddings", ["vec_id", "embedding"])
            )
        ),
        # --- relational coverage (SQL-verified) ---
        "pricing_summary": lambda sf: relational.pricing_summary(_read(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])),
        "segment_revenue": lambda sf: relational.segment_revenue(
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_mktsegment"]),
        ),
        "inactive_customers": lambda sf: relational.inactive_customers(
            _read(sf, "customer", ["c_custkey", "c_name"]),
            _read(sf, "orders", ["o_custkey", "o_orderpriority"]),
        ),
        "top_orders": lambda sf: relational.top_orders(_read(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])),
        "nation_revenue": lambda sf: relational.nation_revenue(
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        ),
        "hourly_events": lambda sf: relational.hourly_events(_read(sf, "events", ["user_id", "ts", "value"])),
        "sliding_events": lambda sf: relational.sliding_events(
            _read(sf, "events", ["user_id", "ts", "value"])
        ),
        "sessionize": lambda sf: relational.sessionize(
            _read(sf, "events", ["user_id", "event_id", "ts", "value"])
        ),
        # --- multimodal plumbing (rows-only; decode stubbed) ---
        "media_features": lambda sf: media.decode_features(
            __import__("ray").data.from_arrow(media.synth_media_table())
        ),
        "media_resize": lambda sf: media.resize_images(
            __import__("ray").data.from_arrow(media.synth_media_table())
        ),
        "media_frames": lambda sf: media.sample_frames(
            __import__("ray").data.from_arrow(media.synth_media_table())
        ),
    }


def oracle_sql() -> dict[str, str]:
    from nmalign_ray.functions import dedup, relational, simsearch, textstats

    return {
        "extract_align_identity": EXTRACT_ALIGN_IDENTITY_SQL,
        "normalize_docs": textstats.NORMALIZE_SQL,
        "token_counts": textstats.TOKEN_COUNT_SQL,
        "quality_scores": textstats.QUALITY_SQL,
        "lang_id": textstats.LANG_ID_SQL,
        "fingerprints": textstats.FINGERPRINT_SQL,
        "quality_filter": textstats.QUALITY_FILTER_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "dedup_keepers": dedup.DEDUP_KEEPERS_SQL,
        "jaccard_sample": dedup.JACCARD_SAMPLE_SQL,
        "minhash_near_dups": dedup.MINHASH_NEAR_DUPS_SQL,
        "simhash_near_dups": dedup.SIMHASH_NEAR_DUPS_SQL,
        "dup_groups": dedup.DUP_GROUPS_SQL,
        "knn_brute": simsearch.KNN_BRUTE_SQL,
        "knn_lsh": simsearch.KNN_LSH_SQL,
        "knn_ivf": simsearch.KNN_IVF_SQL,
        "embedding_near_dups": simsearch.EMBEDDING_NEAR_DUPS_SQL,
        "pricing_summary": relational.PRICING_SUMMARY_SQL,
        "segment_revenue": relational.SEGMENT_REVENUE_SQL,
        "inactive_customers": relational.INACTIVE_CUSTOMERS_SQL,
        "top_orders": relational.TOP_ORDERS_SQL,
        "nation_revenue": relational.NATION_REVENUE_SQL,
        "hourly_events": relational.HOURLY_EVENTS_SQL,
        "sessionize": relational.SESSIONIZE_SQL,
        "sliding_events": relational.SLIDING_EVENTS_SQL,
    }


# Expected output of the full pipeline on the identity family: the derived
# ref segmentation (8-word chunks of whitespace tokens — the word-salad
# documents carry no sentence marks, so corpus_from_documents always takes
# its word-chunk path) comes back verbatim, in order.
EXTRACT_ALIGN_IDENTITY_SQL = """
WITH d AS (
  SELECT 'doc-' || doc_id AS doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
  WHERE trim(text) <> ''
),
segs AS (
  SELECT doc_id,
         [array_to_string(toks[i:i+7], ' ')
          for i in generate_series(1, len(toks), 8)] AS seglist
  FROM d
)
SELECT doc_id,
       CAST(generate_subscripts(seglist, 1) - 1 AS INTEGER) AS "order",
       'text' AS kind,
       unnest(seglist) AS text,
       '' AS media_ref
FROM segs
"""
