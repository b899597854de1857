"""Multi-chip search and training: shard_map over the device mesh.

Distributed design (SURVEY.md §2.3/§5): the reference is single-process
CPU; scale here comes from JAX collectives compiled by XLA, not from any
hand-written transport.

  - search (data parallel): database rows sharded over the `data` axis;
    each chip computes its local exact top-k (one MXU matmul over its
    shard), then an `all_gather` of (k-candidate) tuples and a replicated
    lexicographic merge produce the global top-k. Per-query traffic is
    O(shards * k), independent of corpus size.
  - search (2D): the vector dim additionally sharded over `model`; each
    chip holds a (rows/data, dim/model) block, partial inner products are
    `psum`'d over `model` before the local top-k — tensor parallelism for
    the scoring matmul.
  - k-means step (data parallel): local assignment + per-cluster partial
    sums/counts, `psum` over `data`, replicated centroid update — the
    framework's distributed "training step".

Everything here also runs on N virtual CPU devices
(--xla_force_host_platform_device_count), which is how CI exercises it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import merge_topk


def _local_topk(dists: jax.Array, ids: jax.Array, k: int):
    """(B, n_local) -> (B, k) ascending; assumes +inf on invalid entries.

    When the local shard holds fewer than k rows the candidate block is
    padded with (inf, -1) so the cross-shard gather stays shape-uniform.
    """
    k_eff = min(k, dists.shape[1])
    neg, rows = jax.lax.top_k(-dists, k_eff)
    picked = jnp.take_along_axis(ids, rows, axis=1)
    out_d = -neg
    out_i = jnp.where(jnp.isinf(neg), -1, picked)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        out_d = jnp.pad(out_d, pad, constant_values=jnp.inf)
        out_i = jnp.pad(out_i, pad, constant_values=-1)
    return out_d, out_i


def _merge_gathered(local_d: jax.Array, local_i: jax.Array, k: int, axis: str):
    """all_gather per-shard candidates and merge to the global top-k."""
    all_d = jax.lax.all_gather(local_d, axis)            # (S, B, k)
    all_i = jax.lax.all_gather(local_i, axis)
    s, b, _ = all_d.shape
    cand_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, s * k)
    cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, s * k)
    return merge_topk(cand_d, cand_i, k)


@functools.lru_cache(maxsize=None)
def sharded_search_program(mesh: Mesh, n: int, dim: int, b: int, k: int):
    """Jitted data-parallel exact search over a row-sharded database.

    db (n, dim) and ids/sq_norms (n,) are sharded on the `data` axis;
    queries (b, dim) are replicated. Returns replicated (dists, ids).
    """

    def local(db, ids, sq_norms, queries):
        q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        ip = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
        d = jnp.maximum(q_sq + sq_norms[None, :] - 2.0 * ip, 0.0)
        d = jnp.where(ids[None, :] >= 0, d, jnp.inf)
        local_d, local_i = _local_topk(d, jnp.broadcast_to(ids[None, :], d.shape), k)
        return _merge_gathered(local_d, local_i, k, "data")

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data"), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs are replicated post-all_gather; inference can't prove it
    )
    return jax.jit(shard_fn)


@functools.lru_cache(maxsize=None)
def sharded_search_2d(mesh: Mesh, n: int, dim: int, b: int, k: int):
    """Jitted 2D (data x model) exact search.

    db is sharded (rows over `data`, dim over `model`); queries are
    dim-sharded over `model`. Partial inner products and partial squared
    norms are psum'd over `model`, then the data-parallel merge runs as in
    the 1D program. Output is fully replicated.
    """

    def local(db, ids, queries):
        # db: (n/data, dim/model); queries: (b, dim/model)
        ip_part = jnp.dot(queries, db.T, preferred_element_type=jnp.float32)
        x_sq_part = jnp.sum(db * db, axis=1)
        q_sq_part = jnp.sum(queries * queries, axis=1, keepdims=True)
        ip, x_sq, q_sq = jax.lax.psum((ip_part, x_sq_part, q_sq_part), "model")
        d = jnp.maximum(q_sq + x_sq[None, :] - 2.0 * ip, 0.0)
        d = jnp.where(ids[None, :] >= 0, d, jnp.inf)
        local_d, local_i = _local_topk(d, jnp.broadcast_to(ids[None, :], d.shape), k)
        return _merge_gathered(local_d, local_i, k, "data")

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", "model"), P("data"), P(None, "model")),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs are replicated post-all_gather; inference can't prove it
    )
    return jax.jit(shard_fn)


@functools.lru_cache(maxsize=None)
def sharded_kmeans_step(mesh: Mesh, n: int, dim: int, k: int):
    """One distributed Lloyd iteration: data rows sharded over `data`,
    centroids replicated; partial sums/counts psum over `data`."""

    def local(data, valid, centroids):
        c_sq = jnp.sum(centroids * centroids, axis=1)
        ip = jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1)
        w = valid.astype(jnp.float32)
        sums = jnp.zeros((k, dim), jnp.float32).at[assign].add(data * w[:, None])
        counts = jnp.zeros((k,), jnp.float32).at[assign].add(w)
        sums, counts = jax.lax.psum((sums, counts), "data")
        fresh = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0.0)[:, None], fresh, centroids)

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,  # outputs are replicated post-psum; inference can't prove it
    )
    return jax.jit(shard_fn)


@functools.lru_cache(maxsize=None)
def sharded_ivf_search_program(
    mesh: Mesh, nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int
):
    """Jitted data-parallel IVF search over list-sharded inverted files.

    Layout: centroids are replicated; the inverted lists are partitioned
    round-robin over the `data` axis. Every chip computes the same global
    coarse ranking (tiny matmul), then scans only the probed lists IT
    OWNS — `local_of` maps global list id -> local row (or 0 with a mask).
    Per-chip partial top-k candidates merge via all_gather, exactly as in
    the flat sharded path. Balanced assignment means each chip scans
    ~nprobe/shards lists per query.
    """

    def local(centroids, c_sq, local_vecs, local_ids, owner, local_of, queries):
        # centroids (nlist, dim) replicated; local_vecs (nlist/S, pad, dim)
        my_shard = jax.lax.axis_index("data")
        coarse = (
            c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        )
        _, probes = jax.lax.top_k(-coarse, nprobe)               # (B, nprobe)

        init = (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )

        def probe_step(carry, p):
            best_d, best_i = carry
            lists = probes[:, p]                                  # (B,) global ids
            mine = owner[lists] == my_shard                       # (B,) bool
            rows = local_of[lists]                                # (B,) local row
            vecs = local_vecs[rows]                               # (B, pad, dim)
            ids = jnp.where(mine[:, None], local_ids[rows], -1)   # foreign => invalid
            diff = vecs - queries[:, None, :]
            dist = jnp.sum(diff * diff, axis=-1)
            dist = jnp.where(ids >= 0, dist, jnp.inf)
            merged = merge_topk(
                jnp.concatenate([best_d, dist], axis=1),
                jnp.concatenate([best_i, ids], axis=1),
                k,
            )
            return merged, None

        (local_d, local_i), _ = jax.lax.scan(probe_step, init, jnp.arange(nprobe))
        return _merge_gathered(local_d, local_i, k, "data")

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None),          # centroids replicated
            P(None),                # centroid norms replicated
            P("data", None, None),  # inverted-list vectors, list-sharded
            P("data", None),        # inverted-list ids, list-sharded
            P(None),                # list -> owning shard, replicated
            P(None),                # list -> local row on its owner, replicated
            P(None, None),          # queries replicated
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs are replicated post-all_gather; inference can't prove it
    )
    return jax.jit(shard_fn)


class ShardedIVFIndex:
    """IVF-Flat index with inverted lists sharded across a device mesh.

    Build path mirrors IVFFlatIndex (device k-means + dense padded lists),
    but lists are placed round-robin on the `data` axis so each chip holds
    ~nlist/shards of the corpus and scans only its share of each query's
    probed lists.
    """

    kind = "sharded_ivf"

    def __init__(self, mesh: Mesh, dim: int, nlist: int = 64, nprobe: int = 8):
        self.mesh = mesh
        self.dim = int(dim)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self._staged = None
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def load(self, vectors: np.ndarray, ids: np.ndarray, *, kmeans_iters: int = 8) -> None:
        from ..models.base import next_pow2
        from ..ops.kmeans import assign_clusters, train_kmeans

        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(-1, self.dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        order = np.argsort(ids, kind="stable")
        vectors, ids = vectors[order], ids[order]
        self._n = vectors.shape[0]

        shards = self.mesh.shape["data"]
        nlist = min(self.nlist, max(shards, self._n))
        nlist = ((nlist + shards - 1) // shards) * shards  # divisible by shards
        centroids = train_kmeans(vectors, min(nlist, self._n), iters=kmeans_iters)
        if centroids.shape[0] < nlist:  # tiny corpora: pad with copies
            reps = np.tile(centroids, (nlist // centroids.shape[0] + 1, 1))
            centroids = reps[:nlist]
        assign = assign_clusters(vectors, centroids)

        counts = np.bincount(assign, minlength=nlist)
        pad = next_pow2(max(int(counts.max(initial=1)), 8))
        list_vecs = np.zeros((nlist, pad, self.dim), np.float32)
        list_ids = np.full((nlist, pad), -1, np.int32)
        sort = np.argsort(assign, kind="stable")
        sorted_lists = assign[sort]
        starts = np.zeros((nlist,), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        slots = np.arange(self._n) - starts[sorted_lists]
        list_vecs[sorted_lists, slots] = vectors[sort]
        list_ids[sorted_lists, slots] = ids[sort].astype(np.int32)

        # Round-robin list placement: global list g lives on shard g % S at
        # local row g // S. Rows are reordered shard-major so the sharded
        # first axis slices into exactly each shard's lists.
        g = np.arange(nlist)
        owner = (g % shards).astype(np.int32)
        local_of = (g // shards).astype(np.int32)
        perm = np.argsort(owner * (nlist // shards) + local_of, kind="stable")

        c_sq = np.einsum("nd,nd->n", centroids, centroids).astype(np.float32)
        self._params = (nlist, pad)
        self._staged = (
            jax.device_put(centroids, NamedSharding(self.mesh, P(None, None))),
            jax.device_put(c_sq, NamedSharding(self.mesh, P(None))),
            jax.device_put(list_vecs[perm], NamedSharding(self.mesh, P("data", None, None))),
            jax.device_put(list_ids[perm], NamedSharding(self.mesh, P("data", None))),
            jax.device_put(owner, NamedSharding(self.mesh, P(None))),
            jax.device_put(local_of, NamedSharding(self.mesh, P(None))),
        )

    def search(
        self, queries: np.ndarray, k: int, *, nprobe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(-1, self.dim)
        if self._staged is None or self._n == 0:
            shape = (queries.shape[0], k)
            return np.full(shape, np.inf, np.float32), np.full(shape, -1, np.int64)
        nlist, pad = self._params
        nprobe_eff = min(nprobe or self.nprobe, nlist)
        program = sharded_ivf_search_program(
            self.mesh, nlist, pad, self.dim, queries.shape[0], nprobe_eff, k
        )
        q = jax.device_put(queries, NamedSharding(self.mesh, P(None, None)))
        d, i = program(*self._staged, q)
        return np.asarray(d), np.asarray(i, dtype=np.int64)


class ShardedFlatIndex:
    """Flat exact index sharded across a device mesh.

    Host-side convenience wrapper over sharded_search_program: pads the
    corpus to a per-shard multiple, places shards with NamedSharding, and
    exposes the same search() contract as the single-chip FlatIndex.
    """

    kind = "sharded_flat"

    def __init__(self, mesh: Mesh, dim: int):
        self.mesh = mesh
        self.dim = int(dim)
        self._db = None
        self._ids = None
        self._sq = None
        self._n = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def load(self, vectors: np.ndarray, ids: np.ndarray) -> None:
        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(-1, self.dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        order = np.argsort(ids, kind="stable")
        vectors, ids = vectors[order], ids[order]
        shards = self.mesh.shape["data"]
        self._n = vectors.shape[0]
        per = -(-max(self._n, 1) // shards)
        per = ((per + 7) // 8) * 8  # sublane-align each shard
        cap = per * shards
        db = np.zeros((cap, self.dim), np.float32)
        db[: self._n] = vectors
        idp = np.full((cap,), -1, np.int32)
        idp[: self._n] = ids.astype(np.int32)
        sq = np.einsum("nd,nd->n", db, db).astype(np.float32)
        row_sharding = NamedSharding(self.mesh, P("data", None))
        vec_sharding = NamedSharding(self.mesh, P("data"))
        self._db = jax.device_put(db, row_sharding)
        self._ids = jax.device_put(idp, vec_sharding)
        self._sq = jax.device_put(sq, vec_sharding)

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(-1, self.dim)
        if self._db is None or self._n == 0:
            shape = (queries.shape[0], k)
            return np.full(shape, np.inf, np.float32), np.full(shape, -1, np.int64)
        program = sharded_search_program(
            self.mesh, self._db.shape[0], self.dim, queries.shape[0], k
        )
        q = jax.device_put(queries, NamedSharding(self.mesh, P(None, None)))
        d, i = program(self._db, self._ids, self._sq, q)
        return np.asarray(d), np.asarray(i, dtype=np.int64)
