"""Uniform-weight Levenshtein distance, vectorized across string pairs.

Semantics match ``rapidfuzz.distance.Levenshtein`` with weights (1, 1, 1)
as used by the reference (``/root/reference/nmalign/lib/align.py:5,60-61``):

* ``distance(s1, s2)``: minimum number of insertions/deletions/substitutions.
* ``normalized_similarity(s1, s2) = 1 - distance / max(len1, len2)``
  (and 1.0 when both strings are empty).
* ``cdist(l1, l2, score_cutoff=c)``: similarities below ``c`` are reported
  as 0.0; result dtype is float32 (rapidfuzz's cdist default).

Vectorization strategy: all pairs advance through the row-DP lock-step.
The horizontal (insertion-chain) dependency of the classic recurrence

    D[i][j] = min(D[i-1][j] + 1, D[i][j-1] + 1, D[i-1][j-1] + cost)

is removed with the running-minimum identity

    D[i][j] = j + min_{k <= j} (C[i][k] - k),
    C[i][j] = min(D[i-1][j] + 1, D[i-1][j-1] + cost),  C[i][0] = i

so each DP row is a handful of whole-array NumPy ops plus one
``np.minimum.accumulate`` — no per-character Python.
"""

from __future__ import annotations

import numpy as np

from .codec import PAD_A, PAD_B, encode, encode_list, pad_matrix

# Cap on the number of DP cells ((rows of l1) * M * L2max) advanced at once;
# larger problems are chunked along l1.  ~32M int32 cells ≈ 128 MiB per
# temporary, well inside a worker heap.
_MAX_CELLS = 32_000_000


def levenshtein_distance(s1: str, s2: str) -> int:
    """Scalar uniform-weight Levenshtein distance (reference oracle path)."""
    out = _cdist_block(
        *pad_matrix([encode(s1)], PAD_A), *pad_matrix([encode(s2)], PAD_B)
    )
    return int(out[0, 0])


def levenshtein_cdist(
    l1,
    l2,
    score_cutoff: float | None = None,
    processor=None,
) -> np.ndarray:
    """All-pairs normalized Levenshtein similarity matrix, shape (N, M), float32.

    Drop-in for the reference's
    ``cdist(l1, l2, scorer=normalized_similarity, score_cutoff=cutoff,
    processor=preprocess, workers=...)`` call
    (``/root/reference/nmalign/lib/align.py:60-61``).  ``processor`` is
    applied once per input string (not once per pair), exactly like
    rapidfuzz.  Thread-based ``workers`` parallelism is intentionally
    absent: the Ray pipeline parallelizes across documents instead.
    """
    if processor is not None:
        l1 = [processor(s) for s in l1]
        l2 = [processor(s) for s in l2]
    enc1 = encode_list(l1)
    a_mat, a_len = pad_matrix(enc1, PAD_A)
    b_mat, b_len = pad_matrix(encode_list(l2), PAD_B)
    n, m = len(l1), len(l2)
    l2max = b_mat.shape[1]

    dist = np.empty((n, m), dtype=np.int64)
    # Myers bit-parallel fast path for needles that fit one machine word —
    # but only when the pair count amortizes its per-step setup (measured
    # crossover ~128 pairs; below that the padded row-DP's fewer, larger
    # numpy ops win).  Long rows (>63 chars) always take the row-DP.
    myers_rows = np.flatnonzero((a_len >= 1) & (a_len <= 63))
    if len(myers_rows) * m < 128:
        myers_rows = myers_rows[:0]
        other_rows = np.flatnonzero(a_len > 0)
    else:
        other_rows = np.flatnonzero(a_len > 63)
    empty_rows = np.flatnonzero(a_len == 0)
    if len(myers_rows):
        dist[myers_rows] = _cdist_myers(
            [enc1[i] for i in myers_rows], b_mat, b_len
        )
    if len(empty_rows):
        dist[empty_rows] = np.broadcast_to(b_len, (len(empty_rows), m))
    if len(other_rows):
        rows_per_chunk = max(1, _MAX_CELLS // max(1, m * l2max))
        for lo in range(0, len(other_rows), rows_per_chunk):
            sel = other_rows[lo : lo + rows_per_chunk]
            dist[sel] = _cdist_block(a_mat[sel], a_len[sel], b_mat, b_len)

    denom = np.maximum(a_len[:, None], b_len[None, :])
    frac = dist / np.maximum(denom, 1)
    sim = np.where(denom > 0, 1.0 - frac, 1.0).astype(np.float32)
    if score_cutoff is not None and score_cutoff > 0:
        sim[sim < score_cutoff] = 0.0
    return sim


def _cdist_myers(
    needles: list[np.ndarray], b_mat: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Myers' bit-vector edit distance (1999), vectorized across ALL
    (needle, haystack) pairs at once: the per-pair word state advances
    lock-step over haystack positions; each step is ~a dozen uint64 ops
    on (N, M) arrays.  Exact for needle lengths 1..63 (verified against
    the brute-force DP in tests)."""
    n = len(needles)
    m, l2max = b_mat.shape
    ones = np.uint64(1)

    # encode the haystack alphabet: distinct codepoints -> column index;
    # anything else (incl. padding) -> the zero column
    uniq, inv = np.unique(b_mat, return_inverse=True)
    char_col = {int(c): k + 1 for k, c in enumerate(uniq.tolist())}
    k = len(uniq) + 1
    idx_mat = (inv.reshape(m, l2max) + 1).astype(np.int64)

    peq = np.zeros((n, k), dtype=np.uint64)
    full = np.empty((n, 1), dtype=np.uint64)
    high = np.empty((n, 1), dtype=np.uint64)
    mlen = np.empty((n, 1), dtype=np.int64)
    for i, nd in enumerate(needles):
        li = len(nd)
        full[i, 0] = (1 << li) - 1
        high[i, 0] = 1 << (li - 1)
        mlen[i, 0] = li
        row = peq[i]
        for pos, c in enumerate(nd.tolist()):
            col = char_col.get(int(c))
            if col is not None:
                row[col] |= np.uint64(1 << pos)

    pv = np.broadcast_to(full, (n, m)).copy()
    mv = np.zeros((n, m), dtype=np.uint64)
    score = np.broadcast_to(mlen, (n, m)).copy()
    out = np.empty((n, m), dtype=np.int64)
    done0 = b_len == 0
    if done0.any():
        out[:, done0] = mlen
    for t in range(l2max):
        eq = peq[:, idx_mat[:, t]]  # (n, m) gather
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        score += ((ph & high) != 0).astype(np.int64)
        score -= ((mh & high) != 0).astype(np.int64)
        ph = ((ph << ones) | ones) & full
        mh = (mh << ones) & full
        pv = (mh | ~(xv | ph)) & full
        mv = ph & xv
        finished = b_len == t + 1
        if finished.any():
            out[:, finished] = score[:, finished]
    return out


def _cdist_block(
    a_mat: np.ndarray, a_len: np.ndarray, b_mat: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Raw distances for one chunk of l1 rows vs all of l2. Returns (n, m) int."""
    n = a_mat.shape[0]
    m, l2max = b_mat.shape
    width = l2max + 1
    col = np.arange(width, dtype=np.int32)

    # prev[r, c, j] = D[i-1][j] for pair (r, c)
    prev = np.broadcast_to(col, (n, m, width)).copy()
    out = np.empty((n, m), dtype=np.int64)
    done0 = a_len == 0
    if done0.any():
        out[done0] = np.broadcast_to(b_len, (int(done0.sum()), m))

    imax = int(a_len.max(initial=0))
    cand = np.empty((n, m, width), dtype=np.int32)
    gather_m = np.arange(m)
    for i in range(1, imax + 1):
        ai = a_mat[:, i - 1]  # (n,)
        eq = ai[:, None, None] == b_mat[None, :, :]  # (n, m, l2max)
        # C[i][j] for j>=1: min(sub, delete); C[i][0] = i
        np.add(prev[:, :, :-1], 1, out=cand[:, :, 1:])
        np.subtract(cand[:, :, 1:], eq, out=cand[:, :, 1:])  # prev[j-1] + (1 - eq)
        np.minimum(cand[:, :, 1:], prev[:, :, 1:] + 1, out=cand[:, :, 1:])
        cand[:, :, 0] = i
        # horizontal pass: D[i][j] = j + cummin(C - j)
        cand -= col
        np.minimum.accumulate(cand, axis=2, out=cand)
        cand += col
        finished = a_len == i
        if finished.any():
            out[finished] = cand[finished][:, gather_m, b_len]
        prev, cand = cand, prev
    return out
