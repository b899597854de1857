"""Batched hash bag-of-words embedding as an XLA program.

The reference embeds one text at a time in a Python loop over tokens
(/root/reference/memo_cli.py:158-167). Here the embed of a whole batch is
a single jitted device program: token hashing happens on host (cheap,
deterministic FNV-1a — see utils/hashing.py), then one scatter-add builds
all embedding rows at once and a fused normalize produces unit vectors.

Shapes are padded to power-of-two buckets so repeated CLI invocations and
growing databases reuse cached XLA executables instead of recompiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DIM, NORM_EPSILON
from ..utils.hashing import batch_token_features


def _pow2_at_least(n: int, floor: int = 8) -> int:
    cap = floor
    while cap < n:
        cap *= 2
    return cap


@functools.lru_cache(maxsize=None)
def _embed_program(n_rows: int, n_feats: int, dim: int):
    @jax.jit
    def run(rows: jax.Array, buckets: jax.Array, signs: jax.Array) -> jax.Array:
        grid = jnp.zeros((n_rows, dim), jnp.float32)
        grid = grid.at[rows, buckets].add(signs)
        norms = jnp.linalg.norm(grid, axis=1, keepdims=True)
        blank = norms <= NORM_EPSILON
        return jnp.where(blank, 0.0, grid / jnp.where(blank, 1.0, norms))

    return run


def embed_texts_device(texts: list[str], dim: int = DIM) -> jax.Array:
    """Embed a batch of texts, returning the DEVICE array (B, dim) f32.

    Same values as embed_texts, without the device->host pull. At corpus
    scale the pull is the cost: a 1M x 768 f32 embedding is 3 GB and the
    host link runs at 1-30 MB/s (CLAUDE.md hazard #3), while the inputs
    that must cross (token features) are ~70 MB. Index families accept
    jax.Array end-to-end (models/devbuild.py), so save/reindex keep the
    vectors on device from embed through staging.
    """
    if not texts:
        return jnp.zeros((0, dim), jnp.float32)

    rows, buckets, signs = batch_token_features(texts, dim)

    row_cap = _pow2_at_least(len(texts))
    feat_cap = _pow2_at_least(max(len(rows), 1))
    rows_p = np.zeros((feat_cap,), np.int32)
    buckets_p = np.zeros((feat_cap,), np.int32)
    signs_p = np.zeros((feat_cap,), np.float32)  # pad sign 0 => no-op scatter
    rows_p[: len(rows)] = rows
    buckets_p[: len(buckets)] = buckets
    signs_p[: len(signs)] = signs

    out = _embed_program(row_cap, feat_cap, dim)(rows_p, buckets_p, signs_p)
    return out[: len(texts)]


def embed_texts(texts: list[str], dim: int = DIM) -> np.ndarray:
    """Embed a batch of texts into L2-normalized float32 rows of shape (B, dim).

    Blank texts (no tokens) embed to the zero vector, matching the
    reference's normalize() contract (memo_cli.py:131-135).
    """
    if not texts:
        return np.zeros((0, dim), dtype=np.float32)
    return np.asarray(embed_texts_device(texts, dim))


def embed_text(text: str, dim: int = DIM) -> np.ndarray:
    """Embed a single text into an L2-normalized float32 vector of shape (dim,)."""
    return embed_texts([text], dim)[0]
