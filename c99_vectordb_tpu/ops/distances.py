"""Squared-L2 scoring programs.

Score semantics contract: ascending squared L2 distance over unit vectors
(= 2 - 2*cos), ties broken by lowest record id — matching the reference's
FAISS METRIC_L2 output ordering and printed `Score:` values
(/root/reference/memo_cli.py:244-248, :292; SURVEY.md §2.5 #2).

Two formulations:
  - `pairwise_sq_l2` uses the direct (x - q)^2 expansion — exactly
    non-negative, used on the small CLI path.
  - `scores_via_matmul` uses ||q||^2 + ||x||^2 - 2 q.x so the dominant
    cost is one MXU matmul — used by the large batched paths, where the
    DB norms are precomputed once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_l2(queries: jax.Array, db: jax.Array) -> jax.Array:
    """(B, D) x (N, D) -> (B, N) exact squared L2 distances."""
    diff = queries[:, None, :] - db[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def scores_via_matmul(
    queries: jax.Array, db: jax.Array, db_sq_norms: jax.Array
) -> jax.Array:
    """(B, D) x (N, D) -> (B, N) squared L2 via the matmul expansion.

    The q x db inner product is the MXU-dominant term; db_sq_norms is the
    precomputed per-row ||x||^2. Clamped at 0 to absorb cancellation error.
    """
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    ip = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
    return jnp.maximum(q_sq + db_sq_norms[None, :] - 2.0 * ip, 0.0)


@functools.lru_cache(maxsize=None)
def ranked_program(cap: int, dim: int):
    """Jitted full ranking: one query against a padded DB.

    Returns (distances, ids) each of shape (cap,), sorted ascending by
    (distance, id); invalid (padding) rows sort to the end at +inf.
    """

    @jax.jit
    def run(db: jax.Array, ids: jax.Array, valid: jax.Array, query: jax.Array):
        dists = pairwise_sq_l2(query[None, :], db)[0]
        dists = jnp.where(valid, dists, jnp.inf)
        tie_ids = jnp.where(valid, ids, jnp.iinfo(jnp.int32).max)
        return jax.lax.sort((dists, tie_ids), num_keys=2)

    return run


@functools.lru_cache(maxsize=None)
def ranked_many_program(cap: int, dim: int, batch: int):
    """Jitted full ranking for a BATCH of queries against one padded DB.

    Returns (distances, ids) each of shape (batch, cap); every row is
    sorted ascending by (distance, id) exactly like ranked_program's
    output for that query alone — scoring runs one query at a time inside
    a lax.map so the per-pair arithmetic (and therefore the printed
    scores) matches the single-query program. The batch's win is ONE
    program dispatch instead of `batch` of them: on the TPU relay a
    dispatch costs ~90 ms regardless of work (BASELINE.md round-5
    serving), so this is the serve REPL's --batch fast path.
    """

    @jax.jit
    def run(db: jax.Array, ids: jax.Array, valid: jax.Array, queries: jax.Array):
        def one(q):
            d = pairwise_sq_l2(q[None, :], db)[0]
            return jnp.where(valid, d, jnp.inf)

        dists = jax.lax.map(one, queries)
        tie_ids = jnp.where(valid, ids, jnp.iinfo(jnp.int32).max)
        tie_ids = jnp.broadcast_to(tie_ids[None, :], (batch, cap))
        return jax.lax.sort((dists, tie_ids), num_keys=2)

    return run
