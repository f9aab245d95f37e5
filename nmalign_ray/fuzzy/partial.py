"""``fuzz.partial_ratio`` / ``partial_ratio_alignment``, vectorized.

Reimplements the *published* behavior of rapidfuzz's partial-ratio search
(the consumer is the reference's subsegmentation screen and local
alignment, ``/root/reference/nmalign/lib/align.py:6,181,205``): slide the
shorter string over the longer and report the best ``fuzz.ratio``
(Indel ratio) window, including the partial windows hanging off either
end.  The scan enumerates, in order,

1. prefix windows   ``longer[:i]``            for i in 1..len(shorter)-1,
2. full windows     ``longer[i:i+len(short)]`` for i in 0..len(longer)-len(shorter)-1,
3. suffix windows   ``longer[i:]``            for i in len(longer)-len(shorter)..len(longer)-1,

skipping windows whose boundary character does not occur in the shorter
string (they cannot start/end an optimal alignment — rapidfuzz's char-set
pruning), and keeps the FIRST window that strictly improves the running
best.  All window ratios are computed in one batched Indel DP
(``indel.indel_ratio_windows``); "first strict improvement" is then the
first occurrence of the running maximum, reproduced exactly.

The reference's own FIXME (``align.py:170-173``) documents that this is a
windowed approximation rather than true Smith–Waterman; that quirk is
part of the semantics and is reproduced, not fixed.

Note for consumers: ``dest_start/dest_end`` index the PROCESSED (normalized)
string when a ``processor`` is given — the reference slices the *raw*
string with these positions (``nmalign/scripts/cli.py:105-106``), a quirk
the engine reproduces for fixture parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .codec import encode
from .indel import _popcount64, indel_ratio_windows


@dataclass
class ScoreAlignment:
    """Mirror of rapidfuzz's ScoreAlignment result record."""

    score: float  # 0..100
    src_start: int
    src_end: int
    dest_start: int
    dest_end: int


def partial_ratio(s1: str, s2: str, processor=None, score_cutoff: float | None = None) -> float:
    res = partial_ratio_alignment(s1, s2, processor=processor)
    score = res.score if res is not None else 0.0
    if score_cutoff is not None and score < score_cutoff:
        return 0.0
    return score


def partial_ratio_cdist(
    l1, l2, score_cutoff: float | None = None, processor=None
) -> np.ndarray:
    """(N, M) float32 matrix of partial ratios — the reference's screening
    call ``cdist(subl1, subl2, scorer=partial_ratio, score_cutoff=...)``
    (``/root/reference/nmalign/lib/align.py:181-182``)."""
    out = np.zeros((len(l1), len(l2)), dtype=np.float32)
    for i, a in enumerate(l1):
        for j, b in enumerate(l2):
            out[i, j] = partial_ratio(a, b, processor=processor, score_cutoff=score_cutoff)
    return out


def partial_ratio_alignment(
    s1: str, s2: str, processor=None, score_cutoff: float | None = None
) -> ScoreAlignment | None:
    if processor is not None:
        s1 = processor(s1)
        s2 = processor(s2)
    if len(s1) <= len(s2):
        res = _search(s1, s2)
    else:
        res = _search(s2, s1)
        res = ScoreAlignment(
            res.score, res.dest_start, res.dest_end, res.src_start, res.src_end
        )
    # Symmetric retry for equal-length inputs (rapidfuzz behavior): the
    # window search is not symmetric, so try the flipped orientation too.
    if res.score != 100.0 and len(s1) == len(s2):
        res2 = _search(s2, s1)
        if res2.score > res.score:
            res = ScoreAlignment(
                res2.score, res2.dest_start, res2.dest_end, res2.src_start, res2.src_end
            )
    if score_cutoff is not None and res.score < score_cutoff:
        return None
    return res


def partial_ratio_alignment_many(pairs) -> list[ScoreAlignment]:
    """Batched ``partial_ratio_alignment`` over many ``(s1, s2)`` pairs
    (processor already applied by the caller).

    Semantics are pair-for-pair identical to the scalar form — shorter
    side is the needle, equal-length pairs get the symmetric retry, the
    char-set pruning and first-strict-improvement window selection are
    reproduced — but every window of every pair runs through ONE
    lock-step bit-parallel LCS pass.  The per-pair matrices this serves
    are small (a handful of candidates per subsegmentation screen), so
    the scalar form was numpy-call-overhead-bound, exactly like the main
    similarity matrix before ``levenshtein_cdist_many``; window lengths
    never exceed the needle length (≤ 63 for the bit-parallel class), so
    the global loop stays ≤ 63 steps however many pairs are batched."""
    jobs: list[tuple[str, str]] = []
    swapped: list[bool] = []
    for s1, s2 in pairs:
        if len(s1) <= len(s2):
            jobs.append((s1, s2))
            swapped.append(False)
        else:
            jobs.append((s2, s1))
            swapped.append(True)
    results = _search_many(jobs)
    out: list[ScoreAlignment] = []
    retry_idx: list[int] = []
    for k, ((s1, s2), sw, res) in enumerate(zip(pairs, swapped, results)):
        if sw:
            res = ScoreAlignment(
                res.score, res.dest_start, res.dest_end, res.src_start, res.src_end
            )
        out.append(res)
        if res.score != 100.0 and len(s1) == len(s2):
            retry_idx.append(k)
    if retry_idx:
        retries = _search_many([(pairs[k][1], pairs[k][0]) for k in retry_idx])
        for k, res2 in zip(retry_idx, retries):
            if res2.score > out[k].score:
                out[k] = ScoreAlignment(
                    res2.score,
                    res2.dest_start,
                    res2.dest_end,
                    res2.src_start,
                    res2.src_end,
                )
    return out


def _enumerate_windows(needle: np.ndarray, hay: np.ndarray):
    """Window starts/ends for one ``_search`` job, char-set pruned, in the
    scalar form's exact enumeration order (prefixes, full, suffixes)."""
    l1, l2 = len(needle), len(hay)
    n_pre = min(l1, l2 + 1) - 1
    pre_ends = np.arange(1, n_pre + 1, dtype=np.int64)
    pre_starts = np.zeros(n_pre, dtype=np.int64)
    n_full = max(0, l2 - l1)
    full_starts = np.arange(n_full, dtype=np.int64)
    suf_starts = np.arange(max(0, l2 - l1), l2, dtype=np.int64)
    starts = np.concatenate([pre_starts, full_starts, suf_starts])
    ends = np.concatenate(
        [pre_ends, full_starts + l1, np.full(len(suf_starts), l2, dtype=np.int64)]
    )
    if not len(starts):
        return starts, ends
    bound = np.concatenate(
        [hay[pre_ends - 1], hay[full_starts + l1 - 1], hay[suf_starts]]
    )
    keep = np.isin(bound, needle)
    return starts[keep], ends[keep]


def _search_many(jobs) -> list[ScoreAlignment]:
    """Batched ``_search`` over many ``(shorter, longer)`` jobs."""
    results: list[ScoreAlignment | None] = [None] * len(jobs)
    batch: list[tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
    for j, (sh, lg) in enumerate(jobs):
        l1, l2 = len(sh), len(lg)
        if l1 == 0:
            results[j] = ScoreAlignment(100.0 if l2 == 0 else 0.0, 0, 0, 0, 0)
            continue
        if l1 > 63:
            # general row-DP class — rare (needles here are chunk segments);
            # the scalar path already batches its windows internally
            results[j] = _search(sh, lg)
            continue
        needle = encode(sh)
        hay = encode(lg)
        starts, ends = _enumerate_windows(needle, hay)
        if not len(starts):
            results[j] = ScoreAlignment(0.0, 0, l1, 0, l1)
            continue
        batch.append((j, needle, hay, starts, ends))
    if not batch:
        return results

    # one global PMH array (per-job pattern masks over its haystack) and
    # one global window table; per-job regions stay contiguous so the
    # first-occurrence argmax slices back out in enumeration order
    pmh_parts: list[np.ndarray] = []
    gstarts_parts: list[np.ndarray] = []
    gends_parts: list[np.ndarray] = []
    fullw_parts: list[np.ndarray] = []
    l1w_parts: list[np.ndarray] = []
    offset = 0
    for _, needle, hay, starts, ends in batch:
        l1 = len(needle)
        uniq, inv = np.unique(needle, return_inverse=True)
        masks = np.zeros(len(uniq), dtype=np.uint64)
        np.bitwise_or.at(masks, inv, np.uint64(1) << np.arange(l1, dtype=np.uint64))
        if len(hay):
            idx = np.searchsorted(uniq, hay)
            idxc = np.minimum(idx, len(uniq) - 1)
            pmh_parts.append(
                np.where(uniq[idxc] == hay, masks[idxc], np.uint64(0))
            )
        gstarts_parts.append(starts + offset)
        gends_parts.append(ends + offset)
        full = np.uint64((1 << l1) - 1)
        fullw_parts.append(np.full(len(starts), full, dtype=np.uint64))
        l1w_parts.append(np.full(len(starts), l1, dtype=np.int64))
        offset += len(hay)
    pmh = (
        np.concatenate(pmh_parts) if pmh_parts else np.zeros(1, dtype=np.uint64)
    )
    gstarts = np.concatenate(gstarts_parts)
    gends = np.concatenate(gends_parts)
    fullw = np.concatenate(fullw_parts)
    l1w = np.concatenate(l1w_parts)
    lens = gends - gstarts

    # Hyyrö LCS update — the global-batch twin of
    # indel._indel_windows_bitparallel (and the ratio formula of
    # indel_ratio_windows): change BOTH or the window scores diverge;
    # TestPartialRatioMany fuzzes the two forms against each other
    v = fullw.copy()
    for t in range(int(lens.max(initial=0))):
        pos = gstarts + t
        live = pos < gends
        m = np.where(live, pmh[np.where(live, pos, 0)], np.uint64(0))
        u = v & m
        v = ((v + u) | (v - u)) & fullw
    lcs = _popcount64((~v) & fullw)
    ratios = 100.0 * (1.0 - (l1w + lens - 2 * lcs) / (l1w + lens))

    lo = 0
    for j, needle, hay, starts, ends in batch:
        hi = lo + len(starts)
        r = ratios[lo:hi]
        lo = hi
        best = int(np.argmax(r))  # first occurrence == first strict improvement
        l1 = len(needle)
        if r[best] <= 0.0:
            results[j] = ScoreAlignment(0.0, 0, l1, 0, l1)
        else:
            results[j] = ScoreAlignment(
                float(r[best]), 0, l1, int(starts[best]), int(ends[best])
            )
    return results


def _search(shorter: str, longer: str) -> ScoreAlignment:
    """Best-window search; ``shorter`` is the needle."""
    l1, l2 = len(shorter), len(longer)
    if l1 == 0:
        # ratio of "" vs any non-empty window is 0; vs "" it is 100.
        return ScoreAlignment(100.0 if l2 == 0 else 0.0, 0, 0, 0, 0)
    needle = encode(shorter)
    hay = encode(longer)
    char_set = set(needle.tolist())

    starts: list[int] = []
    ends: list[int] = []
    ok: list[bool] = []
    # 1. prefixes longer[:i], i in 1..l1-1 — boundary char longer[i-1]
    for i in range(1, min(l1, l2 + 1)):
        starts.append(0)
        ends.append(i)
        ok.append(int(hay[i - 1]) in char_set)
    # 2. full windows longer[i:i+l1], i in 0..l2-l1-1 — boundary char last
    for i in range(max(0, l2 - l1)):
        starts.append(i)
        ends.append(i + l1)
        ok.append(int(hay[i + l1 - 1]) in char_set)
    # 3. suffixes longer[i:], i in l2-l1..l2-1 — boundary char first
    for i in range(max(0, l2 - l1), l2):
        starts.append(i)
        ends.append(l2)
        ok.append(int(hay[i]) in char_set)

    if not starts:
        return ScoreAlignment(0.0, 0, l1, 0, l1)

    # drop char-set-skipped windows BEFORE the DP — they are never
    # considered, so computing their scores is pure waste
    keep = np.asarray(ok)
    starts_a = np.asarray(starts, dtype=np.int64)[keep]
    ends_a = np.asarray(ends, dtype=np.int64)[keep]
    if not len(starts_a):
        return ScoreAlignment(0.0, 0, l1, 0, l1)
    ratios = indel_ratio_windows(needle, hay, starts_a, ends_a)
    best = int(np.argmax(ratios))  # first occurrence of max == first strict improvement
    if ratios[best] <= 0.0:
        return ScoreAlignment(0.0, 0, l1, 0, l1)
    return ScoreAlignment(float(ratios[best]), 0, l1, int(starts_a[best]), int(ends_a[best]))
