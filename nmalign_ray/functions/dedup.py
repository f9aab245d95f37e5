"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (see the aggregation-at-scale pattern notes in the
module docstrings):

* exact dedup    — vectorized content hash per batch, then ONE small
  ``groupby(fingerprint)`` over (hash, doc_id) pairs — never the payload;
* MinHash+LSH    — shingle → 64-perm minhash → band rows
  ``(band, band_hash, doc_id)`` → ``groupby`` band buckets → candidate
  pairs → exact-Jaccard verification;
* SimHash        — 64-bit signatures + banded Hamming LSH;
* n-gram Jaccard — exact pairwise verification kernel (also the
  SQL-checkable sample operator).

All signatures use explicit seeded hashing (blake2b / crc32-free
universal hashing) — NEVER Python's salted ``hash`` — so every worker
process and every rerun produces identical values.
"""

from __future__ import annotations

import hashlib
import struct as _struct

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from .textstats import fingerprint_batch, round6

NUM_PERM = 64
NUM_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = (1 << 61) - 1


EXACT_DEDUP_SQL = """
SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
"""


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact deduplication: hash-partition by content fingerprint, keep the
    smallest doc_id per group.  The shuffle moves only (hash, doc_id)
    pairs, not document payloads."""
    hashed = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return hashed.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="dup_count"),
    )


def _norm_tokens(text: str) -> list[str]:
    return text.lower().split()


def shingle_set(text: str, k: int = 3) -> set[str]:
    toks = _norm_tokens(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _perm_params(seed: int = 42):
    # 31-bit multipliers over 32-bit keys: products stay < 2^63, so the
    # mod-p arithmetic below is exact in uint64 (a 61-bit multiplier
    # would silently wrap mod 2^64 before the reduction)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, NUM_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, NUM_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def minhash_signature(shingles: set[str]) -> np.ndarray:
    """64-permutation MinHash signature (uint64) via universal hashing
    h_i(x) = (a_i * x + b_i) mod 2^61-1, vectorized across permutations."""
    if not shingles:
        return np.full(NUM_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    base = np.fromiter((_hash64(s) >> 32 for s in shingles), dtype=np.uint64,
                       count=len(shingles))  # 32-bit keys (see _perm_params)
    # (P, S) = (a[:,None] * base[None,:] + b[:,None]) mod p, min over S —
    # exact: 31-bit a x 32-bit base < 2^63, + b < 2^64, no wrap before mod
    prod = (
        _PERM_A[:, None] * base[None, :] + _PERM_B[:, None]
    ) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def minhash_band_rows(batch: pa.Table) -> pa.Table:
    """documents batch -> (band, band_hash, doc_id) LSH bucket rows."""
    rows_per_band = NUM_PERM // NUM_BANDS
    bands, hashes, ids = [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_signature(shingle_set(text))
        for b in range(NUM_BANDS):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            bands.append(b)
            hashes.append(_struct.unpack(">q", h)[0])
            ids.append(did)
    return pa.Table.from_pydict(
        {
            "band": pa.array(bands, type=pa.int32()),
            "band_hash": pa.array(hashes, type=pa.int64()),
            "doc_id": pa.array(ids, type=batch["doc_id"].type),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(set(group["doc_id"].to_pylist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.Table.from_pydict(
        {"doc_a": pa.array(a, type=group["doc_id"].type),
         "doc_b": pa.array(b, type=group["doc_id"].type)}
    )


def minhash_candidate_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via MinHash banding: documents whose
    signatures collide in at least one band."""
    bands = ds.map_batches(minhash_band_rows, batch_format="pyarrow")
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # distinct pairs (a pair may collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_near_dups(
    ds: ray.data.Dataset, threshold: float = 0.6
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate detection with exact-Jaccard verification.

    The verification stage broadcasts the candidate documents' shingle
    sets via ``ray.put`` (candidates << corpus; at petabyte scale swap
    this for a bucketed join of candidate ids back to the corpus — the
    candidate-pair generation is already fully distributed)."""
    pairs_tbl = minhash_candidate_pairs(ds).to_pandas()
    if pairs_tbl.empty:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        )
    cand_ids = set(pairs_tbl["doc_a"]) | set(pairs_tbl["doc_b"])

    def collect_shingles(batch: pa.Table) -> pa.Table:
        out_ids, out_sh = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if did in cand_ids:
                out_ids.append(did)
                out_sh.append(sorted(shingle_set(text)))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_ids, batch["doc_id"].type),
             "shingles": pa.array(out_sh, pa.list_(pa.string()))}
        )

    sh_tbl = ds.map_batches(collect_shingles, batch_format="pyarrow").to_pandas()
    shingles = {r.doc_id: set(r.shingles) for r in sh_tbl.itertuples()}
    ref = ray.put(shingles)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        rows = {"doc_a": [], "doc_b": [], "jaccard": []}
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            j = jaccard(sh.get(a, set()), sh.get(b, set()))
            if j >= threshold:
                rows["doc_a"].append(a)
                rows["doc_b"].append(b)
                rows["jaccard"].append(float(round6(j)))
        return pa.Table.from_pydict(
            {"doc_a": pa.array(rows["doc_a"], batch["doc_a"].type),
             "doc_b": pa.array(rows["doc_b"], batch["doc_b"].type),
             "jaccard": pa.array(rows["jaccard"], pa.float64())}
        )

    return ray.data.from_pandas(pairs_tbl).map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash

def simhash_signature(text: str) -> int:
    toks = _norm_tokens(text)
    if not toks:
        return 0
    hashes = np.fromiter((_hash64(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = np.uint64(0)
    for k in np.nonzero(votes > 0)[0]:
        sig |= np.uint64(1) << np.uint64(k)
    return int(sig)


def simhash_batch(batch: pa.Table) -> pa.Table:
    sigs = [simhash_signature(t) for t in batch["text"].to_pylist()]
    signed = [s - (1 << 64) if s >= (1 << 63) else s for s in sigs]
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "simhash": pa.array(signed, pa.int64())}
    )


def simhash_signatures(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def simhash_near_dups(ds: ray.data.Dataset, max_hamming: int = 3) -> ray.data.Dataset:
    """Banded-Hamming SimHash near-dup pairs: 4 x 16-bit bands — any pair
    within Hamming distance 3 shares at least one exact band (pigeonhole)."""
    def band_rows(batch: pa.Table) -> pa.Table:
        bands, hashes, ids, sigs = [], [], [], []
        for did, sig in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            u = sig & ((1 << 64) - 1)
            for b in range(4):
                bands.append(b)
                hashes.append((u >> (16 * b)) & 0xFFFF)
                ids.append(did)
                sigs.append(sig)
        return pa.Table.from_pydict(
            {"band": pa.array(bands, pa.int32()),
             "band_hash": pa.array(hashes, pa.int64()),
             "doc_id": pa.array(ids, batch["doc_id"].type),
             "simhash": pa.array(sigs, pa.int64())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist()))
        )
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.Table.from_pydict(
            {"doc_a": pa.array(a, group["doc_id"].type),
             "doc_b": pa.array(b, group["doc_id"].type),
             "hamming": pa.array(d, pa.int32())}
        )

    sigs = simhash_signatures(ds)
    pairs = sigs.map_batches(band_rows, batch_format="pyarrow").groupby(
        ["band", "band_hash"]
    ).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard sample (SQL-checkable)

JACCARD_SAMPLE_MAX_ID = 50

JACCARD_SAMPLE_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents WHERE doc_id < {JACCARD_SAMPLE_MAX_ID} AND trim(text) <> ''
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           ELSE [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                 for i in generate_series(1, len(toks) - 2)] END) AS shingles
  FROM docs
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.shingles, b.shingles)) /
             CAST(len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE), 6)
         AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) > 0
"""


def jaccard_sample(ds: ray.data.Dataset, max_id: int = JACCARD_SAMPLE_MAX_ID) -> ray.data.Dataset:
    """Exact pairwise 3-gram Jaccard over a bounded id sample (the
    verification kernel in SQL-checkable form; pairs with empty
    intersection are omitted)."""
    import pyarrow.compute as pc

    small = ds.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], max_id)), batch_format="pyarrow"
    ).to_pandas()
    sh = {r.doc_id: shingle_set(r.text) for r in small.itertuples()
          if r.text.strip()}
    ids = sorted(sh)
    rows = {"doc_a": [], "doc_b": [], "jaccard": []}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sh[ids[i]] & sh[ids[j]])
            if inter == 0:
                continue
            union = len(sh[ids[i]]) + len(sh[ids[j]]) - inter
            rows["doc_a"].append(ids[i])
            rows["doc_b"].append(ids[j])
            rows["jaccard"].append(float(round6(inter / union)))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_a": pa.array(rows["doc_a"], pa.int64()),
             "doc_b": pa.array(rows["doc_b"], pa.int64()),
             "jaccard": pa.array(rows["jaccard"], pa.float64())}
        )
    )


DEDUP_KEEPERS_SQL = """
SELECT d.doc_id, d.n_chars
FROM documents d
JOIN (
  SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_doc_id
  FROM documents GROUP BY 1
) k ON d.doc_id = k.keep_doc_id
"""


def dedup_keepers(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Documents surviving exact dedup — a broadcast semi-join of the
    (small) keeper-id set back onto the corpus; at petabyte scale the
    keeper set becomes a Bloom filter or a bucketed join."""
    keep_ids = set(
        exact_dedup(ds).to_pandas()["keep_doc_id"].tolist()
    )
    ref = ray.put(keep_ids)

    def semi(batch: pa.Table) -> pa.Table:
        keepers = ray.get(ref)
        mask = pa.array([d in keepers for d in batch["doc_id"].to_pylist()],
                        type=pa.bool_())
        kept = batch.filter(mask)
        return pa.Table.from_pydict(
            {"doc_id": kept["doc_id"], "n_chars": kept["n_chars"]}
        )

    return ds.map_batches(semi, batch_format="pyarrow")


def connected_groups(
    pairs: ray.data.Dataset, max_rounds: int = 10
) -> ray.data.Dataset:
    """Connected components over near-duplicate pairs: distributed
    min-label propagation (the groupby-iteration pattern — no driver-side
    union-find over the full pair set).

    Input: (doc_a, doc_b[, ...]) edge rows.  Output: (doc_id, group_id)
    where group_id is the smallest doc_id reachable from doc_id.  Each
    round propagates every node's current label across its edges and
    keeps the per-node minimum (one small groupby per round over
    (node, label) rows — label rows, never payloads); converges in
    O(component diameter) rounds, bounded by ``max_rounds``.

    Scale note: each round broadcasts the current label map of the
    PAIRED nodes (the near-duplicate subgraph — orders of magnitude
    smaller than the corpus, but not unbounded); if the dup graph itself
    outgrows a broadcast, replace the map lookup with a per-round
    co-group join of edges and labels on ``dst`` — the round structure
    is unchanged."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"]
        b = batch["doc_b"]
        return pa.Table.from_pydict(
            {"src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
             "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])}
        )

    edges = pairs.map_batches(edge_rows, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "group_id": pa.array([], pa.int64())}
            )
        )

    # label(node) starts as the node's own id
    labels = edges.map_batches(
        lambda b: pa.Table.from_pydict(
            {"doc_id": b["src"], "group_id": b["src"]}
        ),
        batch_format="pyarrow",
    ).groupby("doc_id").aggregate(
        Min("group_id", alias_name="group_id")
    ).materialize()
    labels_df = labels.to_pandas()

    for _ in range(max_rounds):
        ref = ray.put(dict(zip(labels_df["doc_id"], labels_df["group_id"])))

        def propagate(batch: pa.Table) -> pa.Table:
            lm = ray.get(ref)
            src = batch["src"].to_pylist()
            dst = batch["dst"].to_pylist()
            return pa.Table.from_pydict(
                {"doc_id": pa.array(src, pa.int64()),
                 "group_id": pa.array([lm[d] for d in dst], pa.int64())}
            )

        labels = (
            edges.map_batches(propagate, batch_format="pyarrow")
            .union(labels)  # keep each node's current label in the min
            .groupby("doc_id")
            .aggregate(Min("group_id", alias_name="group_id"))
            .materialize()
        )
        new_df = labels.to_pandas()
        converged = new_df.equals(labels_df)
        labels_df = new_df
        if converged:
            break
    return labels
