"""Similarity search over the embeddings table (list<float> column).

* ``knn_brute`` — the exact baseline: a small query matrix is broadcast
  once with ``ray.put``; every batch computes its partial cosine top-k
  against the broadcast matrix with one float64 matmul (numpy), and a
  final tiny sort+head-k per query merges the partials.  The full
  embedding table is streamed, never collected.
* ``knn_lsh`` — the scale path: seeded random-hyperplane signatures
  bucket the table; queries probe only their own bucket (plus
  single-bit-flip neighbors), trading recall for a candidate set that
  shrinks with the number of planes.
* ``embedding_near_dups`` — cosine near-duplicate pairs via the same
  LSH buckets.

All float outputs are rounded half-away at 6 decimals (DuckDB parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .textstats import round6

DEFAULT_K = 5
DEFAULT_NUM_QUERIES = 8

KNN_BRUTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {DEFAULT_NUM_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6)
           AS score
  FROM q, embeddings e
  WHERE e.vec_id != q.q_id
)
SELECT q_id, vec_id, score,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
           AS rank
  FROM scored
)
WHERE rank <= {DEFAULT_K}
"""


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norm, 1e-30)


def _stack_embeddings(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def knn_brute(
    ds: ray.data.Dataset,
    k: int = DEFAULT_K,
    num_queries: int = DEFAULT_NUM_QUERIES,
) -> ray.data.Dataset:
    """Exact cosine top-k: queries = rows with vec_id < num_queries
    (self-matches excluded).  Output (q_id, vec_id, score, rank)."""
    import pyarrow.compute as pc

    q_tbl = ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], num_queries)),
        batch_format="pyarrow",
    ).to_pandas()
    q_tbl = q_tbl.sort_values("vec_id")
    q_ids = q_tbl["vec_id"].to_numpy()
    q_mat = _normalize_rows(np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        emb = _normalize_rows(_stack_embeddings(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = qmat @ emb.T  # (Q, B) float64
        rows = {"q_id": [], "vec_id": [], "score": []}
        kk = min(k, emb.shape[0])
        for qi, qid in enumerate(qids):
            mask = vec_ids != qid
            cand = np.nonzero(mask)[0]
            if not len(cand):
                continue
            # order by ROUNDED score desc, vec_id asc — the same total
            # order the SQL oracle's row_number uses, so ties at the
            # per-batch cut keep the same rows the oracle keeps
            s_r = round6(sims[qi][cand])
            order = np.lexsort((vec_ids[cand], -s_r))[:kk]
            top = cand[order]
            rows["q_id"].extend([int(qid)] * len(top))
            rows["vec_id"].extend(vec_ids[top].tolist())
            rows["score"].extend(s_r[order].tolist())
        return pa.Table.from_pydict(
            {"q_id": pa.array(rows["q_id"], pa.int64()),
             "vec_id": pa.array(rows["vec_id"], pa.int64()),
             "score": pa.array(rows["score"], pa.float64())}
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("q_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)

NUM_PLANES = 6


def _planes(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, NUM_PLANES))


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    weights = (1 << np.arange(NUM_PLANES, dtype=np.int64))
    return bits @ weights


def knn_lsh(
    ds: ray.data.Dataset,
    k: int = DEFAULT_K,
    num_queries: int = DEFAULT_NUM_QUERIES,
    probe_bits: int = 2,
) -> ray.data.Dataset:
    """Approximate cosine top-k: random-hyperplane LSH buckets; each query
    probes its own bucket plus all buckets within ``probe_bits`` bit
    flips.  Same output schema as ``knn_brute``; recall < 1 by design
    (tested against the brute baseline)."""
    import pyarrow.compute as pc

    q_tbl = ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], num_queries)),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    q_mat = _normalize_rows(np.stack(q_tbl["embedding"].to_numpy()).astype(np.float64))
    planes = _planes(q_mat.shape[1])
    q_sigs = _signatures(q_mat, planes)
    probe: dict[int, list[int]] = {}
    for qid, sig in zip(q_tbl["vec_id"].to_numpy(), q_sigs):
        sigs = {int(sig)}
        if probe_bits >= 1:
            sigs |= {int(sig) ^ (1 << b) for b in range(NUM_PLANES)}
        if probe_bits >= 2:
            sigs |= {int(sig) ^ (1 << a) ^ (1 << b)
                     for a in range(NUM_PLANES) for b in range(a + 1, NUM_PLANES)}
        for s in sorted(sigs):
            probe.setdefault(s, []).append(int(qid))
    ref = ray.put((q_tbl["vec_id"].to_numpy(), q_mat, probe))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, qmat, probe_map = ray.get(ref)
        emb = _normalize_rows(_stack_embeddings(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sigs = _signatures(emb, planes)
        rows = {"q_id": [], "vec_id": [], "score": []}
        qindex = {int(q): i for i, q in enumerate(q_ids)}
        # bucket membership: which queries probe this row's signature
        for r in range(len(vec_ids)):
            for qid in probe_map.get(int(sigs[r]), ()):
                if vec_ids[r] == qid:
                    continue
                s = float(qmat[qindex[qid]] @ emb[r])
                rows["q_id"].append(qid)
                rows["vec_id"].append(int(vec_ids[r]))
                rows["score"].append(float(round6(s)))
        return pa.Table.from_pydict(
            {"q_id": pa.array(rows["q_id"], pa.int64()),
             "vec_id": pa.array(rows["vec_id"], pa.int64()),
             "score": pa.array(rows["score"], pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["vec_id"]).sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("q_id").map_groups(final_topk, batch_format="pandas")


def embedding_near_dups(ds: ray.data.Dataset, threshold: float = 0.99) -> ray.data.Dataset:
    """Cosine near-duplicate pairs via LSH buckets: pairwise check only
    within same-signature buckets."""
    def sig_rows(batch: pa.Table) -> pa.Table:
        emb = _normalize_rows(_stack_embeddings(batch))
        planes = _planes(emb.shape[1])
        sigs = _signatures(emb, planes)
        return pa.Table.from_pydict(
            {"sig": pa.array(sigs, pa.int64()),
             "vec_id": batch["vec_id"],
             "embedding": batch["embedding"]}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        emb = _normalize_rows(_stack_embeddings(group))
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        emb, ids = emb[order], ids[order]
        sims = emb @ emb.T
        a, b, s = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    s.append(float(round6(sims[i, j])))
        return pa.Table.from_pydict(
            {"vec_a": pa.array(a, pa.int64()),
             "vec_b": pa.array(b, pa.int64()),
             "cosine": pa.array(s, pa.float64())}
        )

    return ds.map_batches(sig_rows, batch_format="pyarrow").groupby("sig").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (coarse-quantizer scale path)

IVF_CLUSTERS = 16
IVF_NPROBE = 4


def _kmeans(sample: np.ndarray, k: int = IVF_CLUSTERS, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means on unit vectors (seeded init, fixed
    iteration count — no convergence-dependent nondeterminism)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-30)
    return centroids


def knn_ivf(
    ds: ray.data.Dataset,
    k: int = DEFAULT_K,
    num_queries: int = DEFAULT_NUM_QUERIES,
    nprobe: int = IVF_NPROBE,
    train_sample: int = 2048,
) -> ray.data.Dataset:
    """Approximate cosine top-k with an IVF coarse quantizer: a small
    seeded sample trains k-means centroids (broadcast once); each batch
    scores only rows whose nearest centroid is among the query's
    ``nprobe`` closest — the candidate set shrinks ~(nprobe / clusters)
    while the centroids stay driver-side-tiny.  Same output schema as
    ``knn_brute``; recall < 1 by design (tested against the baseline)."""
    import pyarrow.compute as pc

    train_tbl = ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], train_sample)),
        batch_format="pyarrow",
    ).to_pandas()
    train = _normalize_rows(np.stack(train_tbl["embedding"].to_numpy())
                            .astype(np.float64))
    centroids = _kmeans(train)

    q_tbl = train_tbl[train_tbl["vec_id"] < num_queries].sort_values("vec_id")
    q_mat = _normalize_rows(np.stack(q_tbl["embedding"].to_numpy())
                            .astype(np.float64))
    q_ids = q_tbl["vec_id"].to_numpy()
    # per query: the nprobe nearest centroids
    q_probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, centroids, q_probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cents, probe = ray.get(ref)
        emb = _normalize_rows(_stack_embeddings(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        assign = np.argmax(emb @ cents.T, axis=1)  # coarse bucket per row
        rows = {"q_id": [], "vec_id": [], "score": []}
        kk = min(k, emb.shape[0])
        for qi, qid in enumerate(qids):
            cand = np.nonzero(np.isin(assign, probe[qi]) & (vec_ids != qid))[0]
            if not len(cand):
                continue
            s_r = round6(qmat[qi] @ emb[cand].T)
            order = np.lexsort((vec_ids[cand], -s_r))[:kk]
            top = cand[order]
            rows["q_id"].extend([int(qid)] * len(top))
            rows["vec_id"].extend(vec_ids[top].tolist())
            rows["score"].extend(s_r[order].tolist())
        return pa.Table.from_pydict(
            {"q_id": pa.array(rows["q_id"], pa.int64()),
             "vec_id": pa.array(rows["vec_id"], pa.int64()),
             "score": pa.array(rows["score"], pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["vec_id"]).sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("q_id").map_groups(final_topk, batch_format="pandas")
