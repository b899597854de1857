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
        return _maximin_core(data, valid, k)

    return run


@functools.lru_cache(maxsize=None)
def _lloyd_multi_program(m: int, n: int, dim: int, k: int, iters: int, chunk: int):
    """vmapped Lloyd's: train m independent codebooks in ONE device program
    (the PQ per-subspace trainer — m sequential host calls would pay m
    dispatch round-trips).

    Unlike the coarse trainer, the per-cluster update here is a one-hot
    MXU matmul, not a scatter-add: at PQ shapes the rows are a few
    columns wide (dsub ~ 4-8), and XLA's scatter serializes on tiny rows
    — measured 1699 -> 176 ms/iter (9.7x) at m=96, 1M x 8, k=256
    (benchmarks/exp_kmeans_update.py). At the coarse shape (768-d rows,
    k=4096) the same swap is neutral (80 vs 81 ms/iter — the assignment
    matmul dominates), so _lloyd_program keeps the exact scatter and its
    f32 accumulation. The one-hot operand is exactly representable; the
    data operand rounds to bf16 under DEFAULT precision, perturbing
    centroids ~0.4 % relative on TPU — irrelevant to PQ codebooks, whose
    quantization cells are orders of magnitude coarser (recall parity
    re-measured in BASELINE.md round-3 tables)."""
    n_chunks = n // chunk

    def single(data: jax.Array, valid: jax.Array, init_centroids: jax.Array):
        chunks = data.reshape(n_chunks, chunk, dim)
        valid_chunks = valid.reshape(n_chunks, chunk)

        def lloyd_iter(centroids, _):
            c_sq = jnp.sum(centroids * centroids, axis=1)

            def accumulate(carry, inputs):
                sums, counts = carry
                block, block_valid = inputs
                assign = _assign_chunk(block, centroids, c_sq)
                w = block_valid.astype(jnp.float32)
                onehot = (
                    assign[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
                ).astype(jnp.float32) * w[:, None]
                sums = sums + jnp.dot(
                    onehot.T, block, preferred_element_type=jnp.float32
                )
                counts = counts + jnp.sum(onehot, axis=0)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                accumulate,
                (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32)),
                (chunks, valid_chunks),
            )
            fresh = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where((counts > 0.0)[:, None], fresh, centroids), None

        final, _ = jax.lax.scan(lloyd_iter, init_centroids, None, length=iters)
        return final

    return jax.jit(jax.vmap(single, in_axes=(0, None, 0)))


@functools.lru_cache(maxsize=None)
def _assign_multi_program(m: int, n: int, dim: int, k: int, chunk: int):
    n_chunks = n // chunk

    def single(data: jax.Array, centroids: jax.Array):
        c_sq = jnp.sum(centroids * centroids, axis=1)
        chunks = data.reshape(n_chunks, chunk, dim)
        return jax.lax.map(
            lambda block: _assign_chunk(block, centroids, c_sq), chunks
        ).reshape(n)

    return jax.jit(jax.vmap(single, in_axes=(0, 0)))


def train_kmeans_multi(
    data_subs,  # (m, N, dsub), numpy or device array
    k: int,
    *,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 2048,
    out_device: bool = False,
):
    """Train m codebooks of k centroids each in one device program.

    Returns (m, k, dsub) float32. Seeding: farthest-first traversal per
    subspace over a strided subsample (vmapped)."""
    data_subs = _as_f32(data_subs)
    m, n, dsub = data_subs.shape
    if n < k:
        raise ValueError(f"need at least k={k} training points, got {n}")
    chunk = min(chunk, n)

    sample_cap = max(k * 16, 16384)
    stride = max(1, n // sample_cap)
    sample = data_subs[:, (seed % stride)::stride][:, : max(k, sample_cap)]
    s_pad, s_valid = _pad_rows_multi(sample, 8)
    init_prog = jax.jit(
        jax.vmap(
            lambda d, v: _maximin_core(d, v, k), in_axes=(0, None)
        )
    )
    init = init_prog(jnp.asarray(s_pad), jnp.asarray(s_valid))

    padded, valid = _pad_rows_multi(data_subs, chunk)
    out = _lloyd_multi_program(m, padded.shape[1], dsub, k, iters, chunk)(
        jnp.asarray(padded), jnp.asarray(valid), init
    )
    return out if out_device else np.asarray(out)


def assign_clusters_multi(
    data_subs, codebooks, *, chunk: int = 2048, out_device: bool = False
):
    """(m, N, dsub) x (m, k, dsub) -> (m, N) int32 assignments in one program."""
    data_subs = _as_f32(data_subs)
    m, n, dsub = data_subs.shape
    if n == 0:
        return np.zeros((m, 0), np.int32)
    chunk = min(chunk, n)
    padded, _ = _pad_rows_multi(data_subs, chunk)
    out = _assign_multi_program(
        m, padded.shape[1], dsub, codebooks.shape[1], chunk
    )(jnp.asarray(padded), jnp.asarray(codebooks, dtype=jnp.float32))[:, :n]
    return out if out_device else np.asarray(out)


def _maximin_core(data: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """Traceable farthest-first traversal body shared by 1-D and vmapped init."""
    dim = data.shape[1]
    w = valid[:, None]
    mean = jnp.sum(data * w, axis=0) / jnp.maximum(jnp.sum(valid), 1.0)
    d_mean = jnp.sum((data - mean) ** 2, axis=1)
    first = jnp.argmax(jnp.where(valid > 0, d_mean, -jnp.inf))

    centroids = jnp.zeros((k, dim), jnp.float32).at[0].set(data[first])
    min_d = jnp.where(valid > 0, jnp.sum((data - data[first]) ** 2, axis=1), -jnp.inf)

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


def _as_f32(data):
    """Normalize input to float32 WITHOUT host<->device transfers: jax
    arrays stay on device (transfers through remote-dispatch tunnels are
    catastrophically slow), numpy stays host-side until the program call."""
    if isinstance(data, jax.Array):
        return data.astype(jnp.float32)
    return np.ascontiguousarray(data, dtype=np.float32)


def _pad_rows_multi(data, multiple: int):
    """(m, N, d) row padding along axis 1; valid mask shared across m."""
    m, n, d = data.shape
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if isinstance(data, jax.Array):
        if n_pad != n:
            data = jnp.pad(data, ((0, 0), (0, n_pad - n), (0, 0)))
        valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
        return data, valid
    if n_pad == n:
        return data, np.ones((n,), np.float32)
    padded = np.zeros((m, n_pad, d), np.float32)
    padded[:, :n] = data
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    return padded, valid


def _pad_rows(data, multiple: int):
    n = data.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if isinstance(data, jax.Array):
        if n_pad != n:
            data = jnp.pad(data, ((0, n_pad - n), (0, 0)))
        valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
        return data, valid
    if n_pad == n:
        return data, np.ones((n,), np.float32)
    padded = np.zeros((n_pad, data.shape[1]), np.float32)
    padded[:n] = data
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    return padded, valid


def train_kmeans(
    data,
    k: int,
    *,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 2048,
    out_device: bool = False,
    init: str = "maximin",
) -> np.ndarray:
    """Train k centroids on (N, D) float32 data (numpy OR device array);
    returns (k, D) float32 (numpy, or device when out_device=True).

    init="maximin" (default) seeds by farthest-first traversal —
    deterministic and never leaves a well-separated cluster unseeded,
    but on HEAVY-TAILED corpora it spends seeds on sparse outlier
    clusters and underfits the dense mass (measured: 52% of a 1M Zipf
    corpus spilled past the IVF pad cap, recall 0.79 flat in nprobe —
    BASELINE.md round 4). init="sample" seeds from a strided subsample
    permutation (Forgy) — mass-proportional by construction, the right
    choice when cluster populations are realistically imbalanced."""
    data = _as_f32(data)
    n = data.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} training points, got {n}")
    chunk = min(chunk, n)

    # Seed over a deterministic strided subsample (capped so init stays
    # O(k * sample) at any corpus size).
    sample_cap = max(k * 16, 16384)
    stride = max(1, n // sample_cap)
    sample = data[(seed % stride)::stride][: max(k, sample_cap)]
    if init == "sample":
        ns = int(sample.shape[0])
        perm = jax.random.permutation(jax.random.key(seed), ns)[:k]
        init_c = jnp.asarray(sample)[perm]
    elif init == "maximin":
        s_pad, s_valid = _pad_rows(sample, 8)
        init_c = _maximin_init_program(s_pad.shape[0], data.shape[1], k)(
            jnp.asarray(s_pad), jnp.asarray(s_valid)
        )
    else:
        raise ValueError(f"unknown kmeans init '{init}'")
    init = init_c

    padded, valid = _pad_rows(data, chunk)
    out = _lloyd_program(padded.shape[0], data.shape[1], k, iters, chunk)(
        jnp.asarray(padded), jnp.asarray(valid), init
    )
    return out if out_device else np.asarray(out)


def assign_clusters(data, centroids, *, chunk: int = 2048, out_device: bool = False):
    """Nearest-centroid assignment for (N, D) data; returns (N,) int32."""
    data = _as_f32(data)
    n = data.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32)
    chunk = min(chunk, n)
    padded, _ = _pad_rows(data, chunk)
    out = _assign_program(padded.shape[0], data.shape[1], centroids.shape[0], chunk)(
        jnp.asarray(padded), jnp.asarray(centroids, dtype=jnp.float32)
    )[:n]
    return out if out_device else np.asarray(out)
