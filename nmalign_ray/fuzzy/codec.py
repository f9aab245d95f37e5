"""String <-> uint32 codepoint-array codec and padding helpers.

All DP kernels in this package operate on ``uint32`` codepoint arrays so
that equality tests vectorize.  Two distinct pad sentinels (one per side)
guarantee padded tails never compare equal.
"""

from __future__ import annotations

import numpy as np

PAD_A = np.uint32(0xFFFFFFFF)
PAD_B = np.uint32(0xFFFFFFFE)


def encode(s: str) -> np.ndarray:
    """Encode a string as a 1-D uint32 array of Unicode codepoints."""
    if not s:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def encode_list(strings) -> list[np.ndarray]:
    return [encode(s) for s in strings]


def pad_matrix(arrs: list[np.ndarray], pad: np.uint32) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length codepoint arrays into a (K, Lmax) matrix.

    Returns ``(matrix, lengths)``; unused tail cells hold ``pad``.
    ``Lmax`` is at least 1 so downstream broadcasting never sees a
    zero-width axis.
    """
    lengths = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    lmax = max(1, int(lengths.max(initial=0)))
    mat = np.full((len(arrs), lmax), pad, dtype=np.uint32)
    for k, a in enumerate(arrs):
        if len(a):
            mat[k, : len(a)] = a
    return mat, lengths
