"""On-device k-means (batched Lloyd's) — the IVF coarse quantizer trainer.

Replaces what FAISS would do in C++ with a fully jitted XLA program
(SURVEY.md §7 step 6): assignment is one MXU matmul per data chunk
(distance = ||x||^2 - 2 x.c + ||c||^2, argmin over centroids), the update
is a segment-sum, and the whole Lloyd iteration runs under `lax.scan` on
device. Chunking bounds the (chunk, k) distance block so 1M+ points train
without materializing (N, k) in HBM.

Determinism: seeding picks initial centroids with a fixed-key
jax.random permutation; empty clusters retain their previous centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _assign_chunk(chunk: jax.Array, centroids: jax.Array, c_sq: jax.Array) -> jax.Array:
    """(chunk, D) x (k, D) -> (chunk,) nearest-centroid index."""
    ip = jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32)
    # ||x||^2 is constant per row — irrelevant to the argmin.
    return jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _lloyd_program(n: int, dim: int, k: int, iters: int, chunk: int):
    n_chunks = n // chunk

    @jax.jit
    def run(data: jax.Array, valid: jax.Array, init_centroids: jax.Array):
        chunks = data.reshape(n_chunks, chunk, dim)
        valid_chunks = valid.reshape(n_chunks, chunk)

        def lloyd_iter(centroids, _):
            c_sq = jnp.sum(centroids * centroids, axis=1)

            def accumulate(carry, inputs):
                sums, counts = carry
                block, block_valid = inputs
                assign = _assign_chunk(block, centroids, c_sq)
                w = block_valid.astype(jnp.float32)
                sums = sums.at[assign].add(block * w[:, None])
                counts = counts.at[assign].add(w)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                accumulate,
                (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32)),
                (chunks, valid_chunks),
            )
            fresh = sums / jnp.maximum(counts, 1.0)[:, None]
            # Empty clusters keep their previous centroid.
            new_centroids = jnp.where((counts > 0.0)[:, None], fresh, centroids)
            return new_centroids, None

        final, _ = jax.lax.scan(lloyd_iter, init_centroids, None, length=iters)
        return final

    return run


@functools.lru_cache(maxsize=None)
def _assign_program(n: int, dim: int, k: int, chunk: int):
    n_chunks = n // chunk

    @jax.jit
    def run(data: jax.Array, centroids: jax.Array):
        c_sq = jnp.sum(centroids * centroids, axis=1)
        chunks = data.reshape(n_chunks, chunk, dim)
        return jax.lax.map(
            lambda block: _assign_chunk(block, centroids, c_sq), chunks
        ).reshape(n)

    return run


@functools.lru_cache(maxsize=None)
def _maximin_init_program(n: int, dim: int, k: int):
    """Farthest-first traversal seeding: start from the point farthest from
    the mean, then repeatedly take the point farthest from every chosen
    centroid. Deterministic, and unlike uniform sampling it cannot leave a
    well-separated cluster unseeded."""

    @jax.jit
    def run(data: jax.Array, valid: jax.Array):
        w = valid[:, None]
        mean = jnp.sum(data * w, axis=0) / jnp.maximum(jnp.sum(valid), 1.0)
        d_mean = jnp.sum((data - mean) ** 2, axis=1)
        first = jnp.argmax(jnp.where(valid > 0, d_mean, -jnp.inf))

        centroids = jnp.zeros((k, dim), jnp.float32).at[0].set(data[first])
        min_d = jnp.where(
            valid > 0, jnp.sum((data - data[first]) ** 2, axis=1), -jnp.inf
        )

        def pick(i, carry):
            cents, dists = carry
            nxt = jnp.argmax(dists)
            chosen = data[nxt]
            cents = cents.at[i].set(chosen)
            d = jnp.sum((data - chosen) ** 2, axis=1)
            dists = jnp.minimum(dists, jnp.where(valid > 0, d, -jnp.inf))
            return cents, dists

        centroids, _ = jax.lax.fori_loop(1, k, pick, (centroids, min_d))
        return centroids

    return run


def _pad_rows(data: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    n = data.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if n_pad == n:
        return data, np.ones((n,), np.float32)
    padded = np.zeros((n_pad, data.shape[1]), np.float32)
    padded[:n] = data
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    return padded, valid


def train_kmeans(
    data: np.ndarray,
    k: int,
    *,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 2048,
) -> np.ndarray:
    """Train k centroids on (N, D) float32 data; returns (k, D) float32."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    n = data.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} training points, got {n}")
    chunk = min(chunk, n)

    # Seed with farthest-first traversal over a deterministic strided
    # subsample (capped so init stays O(k * sample) at any corpus size).
    sample_cap = max(k * 16, 16384)
    stride = max(1, n // sample_cap)
    sample = np.ascontiguousarray(data[(seed % stride)::stride][: max(k, sample_cap)])
    s_pad, s_valid = _pad_rows(sample, 8)
    init = _maximin_init_program(s_pad.shape[0], data.shape[1], k)(
        jnp.asarray(s_pad), jnp.asarray(s_valid)
    )

    padded, valid = _pad_rows(data, chunk)
    out = _lloyd_program(padded.shape[0], data.shape[1], k, iters, chunk)(
        jnp.asarray(padded), jnp.asarray(valid), init
    )
    return np.asarray(out)


def assign_clusters(data: np.ndarray, centroids: np.ndarray, *, chunk: int = 2048) -> np.ndarray:
    """Nearest-centroid assignment for (N, D) data; returns (N,) int32."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    n = data.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32)
    chunk = min(chunk, n)
    padded, _ = _pad_rows(data, chunk)
    out = _assign_program(padded.shape[0], data.shape[1], centroids.shape[0], chunk)(
        jnp.asarray(padded), jnp.asarray(centroids, dtype=jnp.float32)
    )
    return np.asarray(out)[:n]
