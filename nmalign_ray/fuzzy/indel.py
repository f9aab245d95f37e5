"""Indel (insertion/deletion-only) distance and ratio, vectorized over windows.

Semantics match ``rapidfuzz.distance.Indel`` / ``fuzz.ratio``:

* ``indel_distance(s1, s2) = len1 + len2 - 2 * LCS(s1, s2)``
* ``indel_ratio(s1, s2) = 100 * (1 - distance / (len1 + len2))``
  (100.0 when both empty).

``fuzz.partial_ratio`` (see ``partial.py``) needs the ratio of one fixed
needle against MANY substrings (windows) of one haystack; the batched
kernel here advances all windows through the DP lock-step, using the same
running-minimum trick as ``levenshtein.py`` (substitution edges carry a
large finite penalty so they are never taken).
"""

from __future__ import annotations

import numpy as np

from .codec import PAD_A, PAD_B, encode

_BIG = np.int32(1 << 20)  # effective +inf for the forbidden substitution edge


def indel_distance(s1: str, s2: str) -> int:
    a, b = encode(s1), encode(s2)
    starts = np.zeros(1, dtype=np.int64)
    ends = np.full(1, len(b), dtype=np.int64)
    return int(indel_distance_windows(a, b, starts, ends)[0])


def indel_ratio(s1: str, s2: str) -> float:
    la, lb = len(s1), len(s2)
    if la + lb == 0:
        return 100.0
    return 100.0 * (1.0 - indel_distance(s1, s2) / (la + lb))


def indel_distance_windows(
    needle: np.ndarray,
    haystack: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> np.ndarray:
    """Indel distance of ``needle`` vs each ``haystack[starts[w]:ends[w]]``.

    ``needle``/``haystack`` are uint32 codepoint arrays; returns int64 (W,).
    """
    w = len(starts)
    lens = (ends - starts).astype(np.int64)
    l1 = len(needle)
    if w == 0:
        return np.empty(0, dtype=np.int64)
    lmax = max(1, int(lens.max(initial=0)))

    # Gather windows into a padded (W, lmax) matrix.
    idx = starts[:, None] + np.arange(lmax, dtype=np.int64)[None, :]
    mask = idx < ends[:, None]
    win = np.full((w, lmax), PAD_B, dtype=np.uint32)
    if len(haystack):
        np.copyto(win, haystack[np.clip(idx, 0, len(haystack) - 1)], where=mask)

    width = lmax + 1
    col = np.arange(width, dtype=np.int32)
    prev = np.broadcast_to(col, (w, width)).copy()
    cand = np.empty((w, width), dtype=np.int32)
    for i in range(1, l1 + 1):
        ci = np.uint32(needle[i - 1])
        eq = win == ci  # (w, lmax)
        # match edge (diagonal, cost 0) allowed only on equality
        np.add(prev[:, :-1], _BIG, out=cand[:, 1:])
        np.subtract(cand[:, 1:], eq * _BIG, out=cand[:, 1:])
        np.minimum(cand[:, 1:], prev[:, 1:] + 1, out=cand[:, 1:])
        cand[:, 0] = i
        cand -= col
        np.minimum.accumulate(cand, axis=1, out=cand)
        cand += col
        prev, cand = cand, prev
    return prev[np.arange(w), lens].astype(np.int64)


def indel_ratio_windows(
    needle: np.ndarray,
    haystack: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> np.ndarray:
    """``fuzz.ratio`` (0..100, float64) of needle vs each window."""
    lens = (ends - starts).astype(np.int64)
    denom = len(needle) + lens
    dist = indel_distance_windows(needle, haystack, starts, ends)
    out = np.where(denom > 0, 100.0 * (1.0 - dist / np.maximum(denom, 1)), 100.0)
    return out
