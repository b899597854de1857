"""Exact batched top-k search programs (XLA reference path).

This is the always-correct baseline the fused Pallas kernel
(ops/topk_pallas.py) is benchmarked against: score the full padded DB via
one MXU matmul, then select the k smallest distances per query with
`lax.top_k`. Padding rows carry +inf distance and id sentinel -1.

Tie-breaking: `lax.top_k` prefers the lower row position on equal keys;
index rows are maintained in ascending-id order by the Flat index, so
equal distances resolve to the lowest id — the reference's output order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distances import scores_via_matmul


@functools.lru_cache(maxsize=None)
def topk_program(cap: int, dim: int, k: int):
    """Jitted (B, dim) x (cap, dim) -> top-k (distances (B,k), ids (B,k))."""

    @jax.jit
    def run(
        db: jax.Array,
        ids: jax.Array,
        valid: jax.Array,
        sq_norms: jax.Array,
        queries: jax.Array,
    ):
        dists = scores_via_matmul(queries, db, sq_norms)
        dists = jnp.where(valid[None, :], dists, jnp.inf)
        neg_top, rows = jax.lax.top_k(-dists, k)
        out_ids = jnp.where(neg_top > -jnp.inf, ids[rows], -1)
        return -neg_top, out_ids

    return run


def merge_topk(dists: jax.Array, ids: jax.Array, k: int):
    """Merge candidate sets: (B, C) -> exact (B, k) by (distance, id).

    Used to combine per-shard / per-tile partial top-k results. Invalid
    candidates must carry +inf distance. Ids are made the secondary sort
    key so cross-source ties resolve deterministically to the lowest id.
    When C < k the output PADS to width k with (inf, -1) — callers (and
    the sharded all_gather merge) rely on a fixed (B, k) shape even for
    tiny corpora.
    """
    if dists.shape[-1] < k:
        pad = [(0, 0)] * (dists.ndim - 1) + [(0, k - dists.shape[-1])]
        dists = jnp.pad(dists, pad, constant_values=jnp.inf)
        ids = jnp.pad(ids, pad, constant_values=-1)
    big = jnp.iinfo(jnp.int32).max
    tie_ids = jnp.where(jnp.isinf(dists), big, ids)
    sorted_d, sorted_i = jax.lax.sort((dists, tie_ids), num_keys=2, dimension=-1)
    out_d = sorted_d[..., :k]
    out_i = sorted_i[..., :k]
    return out_d, jnp.where(out_i == big, -1, out_i)
