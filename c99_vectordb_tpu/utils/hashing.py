"""Deterministic token hashing for the bag-of-words embedder.

DELIBERATE DEVIATION from the reference: memo uses Python's builtin
`hash()` (reference /root/reference/memo_cli.py:163), which is salted per
process (PYTHONHASHSEED), so vectors written by one invocation never match
query vectors embedded by a later one — cross-process recall is broken
upstream (SURVEY.md §2.5 #1). This module replaces it with FNV-1a 64-bit,
which is deterministic across processes, platforms, and time.

The mapping token -> (bucket, sign) mirrors the reference's scheme shape:
bucket = h mod dim, sign from the lowest hash bit.

A C++ fast path (native/tokenize_hash.cc) accelerates bulk hashing during
large index builds; this module is the always-available pure-Python
reference implementation and the arbiter of correctness.
"""

from __future__ import annotations

import numpy as np

from .text import tokenize

_FNV_OFFSET = 0xCBF29CE484B1A325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


def token_features(text: str, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash a text's tokens into (buckets, signs) feature arrays.

    Returns int32 bucket indices in [0, dim) and float32 signs in {-1, +1},
    one entry per token occurrence (duplicates intentionally retained —
    the embedder accumulates them, reference memo_cli.py:162-166).
    """
    tokens = tokenize(text)
    n = len(tokens)
    buckets = np.empty((n,), dtype=np.int32)
    signs = np.empty((n,), dtype=np.float32)
    for i, tok in enumerate(tokens):
        h = fnv1a_64(tok.encode("utf-8"))
        buckets[i] = h % dim
        signs[i] = 1.0 if (h & 1) else -1.0
    return buckets, signs
