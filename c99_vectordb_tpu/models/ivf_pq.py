"""IVF-PQ index — product-quantized codes with ADC lookup-table search.

TPU design (SURVEY.md §7 step 7): vectors are encoded as m uint8 codes of
per-subspace residual codebooks (256 centroids each), so the database
lives HBM-resident at m bytes/vector. Search is asymmetric distance
computation (ADC), one jitted program:

  1. coarse MXU matmul -> top-nprobe lists per query
  2. per probe rank: the query's residual against that list's centroid is
     scored against every codebook entry, giving a (m, 256) lookup table
     per query; distances to all codes in the list are then a gather +
     sum over subspaces (take_along_axis on the LUT)
  3. exact lexicographic merge into the running top-k

Distance estimate: d(q, x) ~= sum_j || r_j - codebook_j[code_j] ||^2
with r = q - coarse_centroid — the standard residual-ADC estimator.

Train/encode reuse the on-device k-means of ops/kmeans.py per subspace.

Storage modes (models/devbuild.py, VERDICT r3 #1): numpy inputs keep the
host-mirror semantics (the CLI scale); a jax.Array first input switches
to DEVICE mode — train, rotate, encode, bucket, scatter, item constants
and the refine store all build on device (the recipe proven at 9.1 s for
a 1M x 384 build in benchmarks/run10m.py vs 124.7 s through the host
link), and after staging the code canvas + refine store ARE the storage.

Incremental add (the reference's O(insert) add_with_ids,
/root/reference/memo_cli.py:282,437): rows added after staging are
encoded immediately, their raw values scattered into the live refine
store in place (donated updates), and their ADC reconstructions parked
in a device tail that the search merges into the shortlist — scored by
the same estimator, masked to the same probed lists — so results match a
fresh build. A lazy restage folds the tail into the lists past
tail_restage_threshold. Staging is never invalidated by an add.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DIM
from ..ops.distances import scores_via_matmul
from ..ops.kmeans import (
    assign_clusters,
    assign_clusters_multi,
    train_kmeans,
    train_kmeans_multi,
)
from ..ops.rerank import exact_rerank_staged
from ..ops.topk import merge_topk
from .base import list_pad, next_pow2
from .devbuild import (
    ChunkStore,
    GrowTail,
    bucketize_device,
    is_device_array,
    merge_tail,
    scatter_list_ids_device,
    scatter_lists_device,
    tail_restage_threshold,
    tail_scores,
)
from .registry import register

LANE_K = 128  # shortlists beyond ~a lane tile use the dense ADC variant


def train_opq_rotation(
    data, m: int, *, ksub: int = 256, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """Learn an orthogonal OPQ rotation R (x_rot = x @ R) by alternating
    minimization (Ge et al., 'Optimized Product Quantization', the
    non-parametric variant): fix R -> train per-subspace codebooks on X R;
    fix codebooks -> R = U V^T from svd(X^T Y), Y = decode(encode(X R)) —
    the orthogonal Procrustes solution.

    The whole loop is DEVICE-resident: the sample crosses the host link
    at most once, and per iteration only the (D, D) cross-covariance
    comes back for the host SVD. The previous host-side loop re-shipped
    the ~100 MB subspace view twice per iteration through this
    container's 1-30 MB/s transfer link — 266 s for 6 iterations at
    65k x 384; device-resident it is ~2 s. `data` may be numpy or a
    device array (e.g. a corpus chunk that never left the TPU)."""
    n, dim = data.shape
    sample_cap = 65_536
    stride = max(1, n // sample_cap)
    if isinstance(data, jax.Array):
        x = data[::stride][:sample_cap].astype(jnp.float32)
    else:
        x = jnp.asarray(
            np.ascontiguousarray(data[::stride][:sample_cap], dtype=np.float32)
        )
    ns = int(x.shape[0])
    dsub = dim // m
    ksub_eff = min(ksub, max(1, ns))
    rot = jnp.eye(dim, dtype=jnp.float32)
    for it in range(max(1, iters)):
        # HIGHEST keeps the rotated training view exact f32 on TPU (the
        # old host path was f32 throughout); one (65k, D) x (D, D)
        # matmul per iteration is negligible next to the k-means stage.
        xr = jnp.dot(
            x, rot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        subs = jnp.transpose(xr.reshape(ns, m, dsub), (1, 0, 2))
        books = train_kmeans_multi(
            subs, ksub_eff, iters=3, seed=seed + 7 + it, out_device=True
        )
        codes = assign_clusters_multi(subs, books, out_device=True)  # (m, ns)
        recon_subs = jnp.take_along_axis(
            books, codes[:, :, None].astype(jnp.int32), axis=1
        )                                                    # (m, ns, dsub)
        recon = jnp.transpose(recon_subs, (1, 0, 2)).reshape(ns, dim)
        cross = jnp.dot(
            x.T, recon,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        u, _, vt = np.linalg.svd(np.asarray(cross), full_matrices=False)
        rot = jnp.asarray(np.ascontiguousarray((u @ vt).astype(np.float32)))
    return np.asarray(rot)


@functools.lru_cache(maxsize=None)
def _adc_ranked_program(nlist: int, pad: int, dim: int, m: int, ksub: int):
    """Full ADC ranking of EVERY code against one query, in bounded
    memory: a lax.scan over lists (one (pad,) distance block per step)
    followed by a single (nlist*pad,) lexicographic sort. Replaces the
    k=ntotal in-kernel shortlist the pure-ADC ranked_all used to request
    (VERDICT round 2, weak #7 — a k=1M sorted-insertion scratch)."""
    dsub = dim // m

    @jax.jit
    def run(centroids, codebooks, list_codes, list_ids, query):
        def list_step(_, args):
            centroid, codes, ids = args
            residual = query - centroid                       # (D,)
            r_sub = residual.reshape(m, 1, dsub)
            lut = jnp.sum((r_sub - codebooks) ** 2, axis=-1)  # (m, ksub)
            gathered = jnp.take_along_axis(
                lut, codes.astype(jnp.int32).T, axis=1
            )                                                 # (m, pad)
            d = jnp.sum(gathered, axis=0)                     # (pad,)
            return None, jnp.where(ids >= 0, d, jnp.inf)

        _, dists = jax.lax.scan(
            list_step, None, (centroids, list_codes, list_ids)
        )
        flat_d = dists.reshape(-1)
        flat_i = list_ids.reshape(-1)
        big = jnp.iinfo(jnp.int32).max
        tie = jnp.where(jnp.isinf(flat_d), big, flat_i)
        sd, si = jax.lax.sort((flat_d, tie), num_keys=2)
        return sd, jnp.where(si == big, -1, si)

    return run


@functools.lru_cache(maxsize=None)
def _rotate_program(dim: int, b: int):
    @jax.jit
    def run(queries: jax.Array, rotation: jax.Array) -> jax.Array:
        return jnp.dot(queries, rotation, preferred_element_type=jnp.float32)

    return run


@functools.lru_cache(maxsize=None)
def _rotate_exact_program(dim: int, n: int):
    """Build/encode-side rotation at HIGHEST precision — the host path
    rotated in exact f32, and PQ codes should not depend on backend."""

    @jax.jit
    def run(data, rotation):
        return jnp.dot(
            data, rotation,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return run


@functools.lru_cache(maxsize=None)
def _adc_search_program(
    nlist: int, pad: int, dim: int, m: int, ksub: int, b: int, nprobe: int,
    k: int, masked: bool = False,
):
    dsub = dim // m

    @jax.jit
    def run(
        centroids: jax.Array,    # (nlist, D)
        c_sq: jax.Array,         # (nlist,)
        codebooks: jax.Array,    # (m, ksub, dsub)
        list_codes: jax.Array,   # (nlist, pad, m) uint8
        list_ids: jax.Array,     # (nlist, pad) int32
        queries: jax.Array,      # (B, D)
        keep: jax.Array | None = None,  # (nlist, pad) bool when masked
    ):
        coarse = scores_via_matmul(queries, centroids, c_sq)       # (B, nlist)
        _, probes = jax.lax.top_k(-coarse, nprobe)                 # (B, nprobe)

        init = (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )

        def probe_step(carry, p):
            best_d, best_i = carry
            lists = probes[:, p]                                   # (B,)
            residual = queries - centroids[lists]                  # (B, D)
            r_sub = residual.reshape(b, m, 1, dsub)
            # Per-query ADC table: (B, m, ksub)
            diff = r_sub - codebooks[None]                         # (B, m, ksub, dsub)
            lut = jnp.sum(diff * diff, axis=-1)
            codes = list_codes[lists].astype(jnp.int32)            # (B, pad, m)
            ids = list_ids[lists]                                  # (B, pad)
            # Gather LUT entries: (B, m, pad) then reduce subspaces.
            gathered = jnp.take_along_axis(lut, codes.transpose(0, 2, 1), axis=2)
            d = jnp.sum(gathered, axis=1)                          # (B, pad)
            d = jnp.where(ids >= 0, d, jnp.inf)
            if masked:
                d = jnp.where(keep[lists], d, jnp.inf)
            merged = merge_topk(
                jnp.concatenate([best_d, d], axis=1),
                jnp.concatenate([best_i, ids], axis=1),
                k,
            )
            return merged, None

        (best_d, best_i), _ = jax.lax.scan(probe_step, init, jnp.arange(nprobe))
        return best_d, best_i

    return run


@functools.lru_cache(maxsize=None)
def _residual_subs_program(n: int, dim: int, m: int):
    dsub = dim // m

    @jax.jit
    def run(data, centroids, assign):
        res = data - centroids[assign]
        return res.reshape(n, m, dsub).transpose(1, 0, 2)

    return run


@functools.lru_cache(maxsize=None)
def _decode_recon_program(n: int, dim: int, m: int, ksub: int):
    """codes (n, m) + assign -> reconstruction centroid[a] + decode(codes)
    in the quantization space: exact-scoring these rows reproduces the
    ADC estimate (d_adc = ||q_rot - x_hat||^2), which is how the tail
    stays estimator-faithful to a fresh build."""
    dsub = dim // m

    @jax.jit
    def run(codes, assign, centroids, codebooks):
        y = jnp.take_along_axis(
            codebooks[None], codes.astype(jnp.int32)[:, :, None, None], axis=2
        )[:, :, 0, :]                                     # (n, m, dsub)
        return centroids[assign] + y.reshape(n, dim)

    return run


@functools.lru_cache(maxsize=None)
def _refine_scatter_program(cap: int, dim: int, n: int, dtype: str):
    @jax.jit
    def run(vecs, positions, ids):
        store = jnp.zeros((cap, dim), jnp.dtype(dtype))
        store = store.at[positions].set(vecs.astype(jnp.dtype(dtype)))
        ids_arr = jnp.full((cap,), -1, jnp.int32).at[positions].set(ids)
        valid = jnp.zeros((cap,), bool).at[positions].set(True)
        return store, ids_arr, valid

    return run


from .devbuild import _donate_first  # TPU-only donation gate (shared)


@functools.lru_cache(maxsize=None)
def _refine_update_program(cap: int, dim: int, batch: int, dtype: str):
    @functools.partial(jax.jit, donate_argnums=_donate_first())
    def run(store, rows, positions):
        return store.at[positions].set(rows.astype(jnp.dtype(dtype)))

    return run


@functools.lru_cache(maxsize=None)
def _refine_meta_update_program(cap: int, batch: int):
    @jax.jit
    def run(ids_arr, valid, positions, new_ids):
        return (
            ids_arr.at[positions].set(new_ids),
            valid.at[positions].set(True),
        )

    return run


@functools.lru_cache(maxsize=None)
def _pad_rows_to_program(cap_old: int, cap_new: int, dim: int, dtype: str):
    @jax.jit
    def run(store):
        return jnp.pad(store, ((0, cap_new - cap_old), (0, 0)))

    return run


@functools.lru_cache(maxsize=None)
def _pad_meta_to_program(cap_old: int, cap_new: int):
    @jax.jit
    def run(ids_arr, valid):
        extra = cap_new - cap_old
        return (
            jnp.pad(ids_arr, (0, extra), constant_values=-1),
            jnp.pad(valid, (0, extra)),
        )

    return run


@register
class IVFPQIndex:
    kind = "ivf_pq"

    def __init__(
        self,
        dim: int = DIM,
        nlist: int = 64,
        nprobe: int = 8,
        m: int = 8,
        ksub: int = 256,
        refine: bool = True,
        refine_factor: int = 4,
        refine_dtype: str = "float32",
        opq: bool = False,
        opq_iters: int = 8,
        capacity: int | None = None,
        pad_cap: int | None = None,
    ):
        """refine=True keeps raw vectors and exactly re-ranks the ADC
        top-(k*refine_factor) candidates (the FAISS IndexRefineFlat
        pattern) — ADC alone caps recall@10 well below 1.0 because the
        quantization error is on the same scale as neighbor gaps. Set
        refine=False for a pure compressed index (m bytes/vector).
        refine_dtype="bfloat16" halves the refine store (memory honesty:
        with refine on, index memory = codes + refine store, NOT just the
        m-bytes/vector codes).

        opq=True learns an orthogonal rotation R before quantization
        (OPQ, the FAISS OPQMatrix pre-transform): alternate PQ training
        on rotated data with the orthogonal-Procrustes update
        R <- UV^T from svd(X^T decode(encode(XR))). Rotation preserves
        L2, so scores/refine are unchanged; queries pay one extra
        (D, D) MXU matmul. Raises ADC shortlist quality on
        cross-subspace-correlated data.

        capacity (optional) pre-declares the corpus size: the device-mode
        refine store allocates ONCE at 128-aligned capacity and adds
        scatter into it eagerly (donated, O(batch)) instead of retaining
        vector chunks until staging — the memory shape that fits a
        10M x 384 bf16 build on one v5e (pow2 growth from zero would
        transiently hold ~2x the corpus). Exceeding the declared
        capacity still works (the store grows), it just pays the copy.

        pad_cap bounds inverted-list length exactly like IVFFlatIndex's
        (devbuild.capped_assign — overflow rows relocate to their
        next-nearest centroid with space). On a heavy-tailed corpus the
        uncapped code canvas (nlist, pad, m) and per-probe ADC cost
        inflate by the max/mean cell ratio (the zipf corpus measured a
        ~23x ratio; the 10M benchmark needed a 1920 cap to fit).
        Because PQ codes are RESIDUAL-encoded against their list's
        centroid, relocated rows must re-encode — so pad_cap requires
        refine=True (raw rows retained); staging re-encodes from them
        whenever any list over-caps."""
        if dim % m != 0:
            raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
        if refine_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported refine_dtype '{refine_dtype}'")
        if pad_cap is not None and int(pad_cap) < 8:
            raise ValueError(f"pad_cap must be >= 8, got {pad_cap}")
        if pad_cap and not refine:
            raise ValueError(
                "pad_cap requires refine=True: PQ codes are residual-"
                "encoded against their list's centroid, so capped "
                "staging must re-encode relocated rows from raw vectors"
            )
        self.dim = int(dim)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.m = int(m)
        self.ksub = int(ksub)
        self.refine = bool(refine)
        self.refine_factor = int(refine_factor)
        self.refine_dtype = str(refine_dtype)
        self.opq = bool(opq)
        self.opq_iters = int(opq_iters)
        self.capacity = int(capacity) if capacity else None
        self.pad_cap = int(pad_cap) if pad_cap else None
        self._geometry: dict | None = None
        self._rotation: np.ndarray | None = None  # (D, D); x_rot = x @ R
        self._rotation_dev: jax.Array | None = None
        # Host-mode mirrors (numpy; the CLI scale).
        self._vectors = np.zeros((0, self.dim), dtype=np.float32)
        self._ids = np.zeros((0,), dtype=np.int64)
        self._codes = np.zeros((0, self.m), dtype=np.uint8)
        self._assign: np.ndarray | None = None
        # Device-mode chunk stores (corpus scale; freed after staging).
        self._mode = "host"
        self._dev_vecs = ChunkStore()       # kept rows (refine only)
        self._dev_ids = ChunkStore()
        self._dev_assign = ChunkStore()
        self._dev_codes = ChunkStore()
        self._n_dev = 0
        self._centroids = None              # np or device (nlist_eff, D)
        self._codebooks = None              # np or device (m, ksub_eff, dsub)
        self._staged = None
        self._staged_refine = None
        self._cap_valid = False
        self._refine_rows = 0               # rows materialized (positional)
        self._tail: GrowTail | None = None
        self._restage_needed = False
        from .devbuild import MaskCache

        self._mask_cache = MaskCache()

    # -- introspection -------------------------------------------------------

    @property
    def ntotal(self) -> int:
        if self._mode == "device":
            return self._n_dev
        return int(self._ids.shape[0])

    @property
    def is_trained(self) -> bool:
        return self._centroids is not None and self._codebooks is not None

    def ids(self) -> np.ndarray:
        if self._mode == "device":
            if self._n_dev == 0:
                return np.zeros((0,), np.int64)
            ids, _, _ = self._codes_all()
            return np.asarray(ids).astype(np.int64)
        return self._ids.copy()

    @property
    def code_bytes_per_vector(self) -> int:
        return self.m

    def geometry_diagnostic(self) -> dict:
        """Clustering-geometry stats of the current staging (stages if
        needed) — devbuild.corpus_geometry; the CLI's -v reindex path
        surfaces geometry_advice from it."""
        from .devbuild import corpus_geometry

        if self.ntotal == 0 or not self.is_trained:
            return corpus_geometry(np.zeros((0,), np.int64))
        self._stage()
        return self._geometry

    # -- training --------------------------------------------------------------

    def _train_opq_rotation(self, data, *, iters: int, seed: int) -> None:
        self._rotation = train_opq_rotation(
            data, self.m, ksub=self.ksub, iters=iters, seed=seed
        )
        self._rotation_dev = None

    def _rotate(self, data: np.ndarray) -> np.ndarray:
        """Host-side rotation — build/encode paths only (batched, offline)."""
        if self._rotation is None:
            return data
        return np.ascontiguousarray(data @ self._rotation)

    def _rotate_device(self, data):
        """Device-side build/encode rotation (HIGHEST — codes must not
        depend on backend rounding)."""
        if self._rotation is None:
            return data
        if self._rotation_dev is None:
            self._rotation_dev = jax.device_put(self._rotation)
        return _rotate_exact_program(self.dim, int(data.shape[0]))(
            data.astype(jnp.float32), self._rotation_dev
        )

    def _rotate_queries(self, queries):
        """Query rotation ON DEVICE (one (B, D) x (D, D) MXU matmul) — the
        search hot path must not pay a host matmul + an extra transfer."""
        if self._rotation is None:
            return queries
        if self._rotation_dev is None:
            self._rotation_dev = jax.device_put(self._rotation)
        return _rotate_program(self.dim, queries.shape[0])(
            jnp.asarray(queries), self._rotation_dev
        )

    def _centroids_dev(self):
        if not is_device_array(self._centroids):
            self._centroids = jax.device_put(
                np.ascontiguousarray(self._centroids, np.float32)
            )
        return self._centroids

    def _codebooks_dev(self):
        if not is_device_array(self._codebooks):
            self._codebooks = jax.device_put(
                np.ascontiguousarray(self._codebooks, np.float32)
            )
        return self._codebooks

    def train(self, data, *, iters: int = 10, seed: int = 0,
              init: str = "maximin") -> None:
        """init: coarse-quantizer seeding (ops/kmeans.train_kmeans) —
        "maximin" default; "sample" (Forgy) is mass-proportional for
        heavy-tailed corpora (measured zipf guidance, BASELINE.md)."""
        if is_device_array(data) and self.ntotal == 0:
            self._mode = "device"
        if self._mode == "device" and not is_device_array(data):
            data = jnp.asarray(np.ascontiguousarray(data, np.float32))
        if self._mode == "device":
            data = data.astype(jnp.float32).reshape(-1, self.dim)
            n = int(data.shape[0])
            if self.opq and self._rotation is None:
                self._train_opq_rotation(data, iters=self.opq_iters, seed=seed)
            data = self._rotate_device(data)
            nlist_eff = min(self.nlist, max(1, n))
            self._centroids = train_kmeans(
                data, nlist_eff, iters=iters, seed=seed, out_device=True,
                init=init,
            )
            assign = assign_clusters(data, self._centroids, out_device=True)
            subs = _residual_subs_program(n, self.dim, self.m)(
                data, self._centroids, assign
            )
            ksub_eff = min(self.ksub, max(1, n))
            self._codebooks = train_kmeans_multi(
                subs, ksub_eff, iters=iters, seed=seed + 1, out_device=True
            )
            if self.ntotal:
                self._reencode_all_device()
            self._staged = None
            self._staged_refine = None
            self._cap_valid = False
            self._tail = None
            self._restage_needed = False
            return
        data = np.ascontiguousarray(
            np.asarray(data), dtype=np.float32
        ).reshape(-1, self.dim)
        if self.opq and self._rotation is None:
            self._train_opq_rotation(data, iters=self.opq_iters, seed=seed)
        data = self._rotate(data)
        n = data.shape[0]
        nlist_eff = min(self.nlist, max(1, n))
        self._centroids = train_kmeans(
            data, nlist_eff, iters=iters, seed=seed, init=init
        )
        assign = assign_clusters(data, self._centroids)
        residuals = data - self._centroids[assign]
        dsub = self.dim // self.m
        ksub_eff = min(self.ksub, max(1, n))
        # All m subspace codebooks train in ONE vmapped device program.
        subs = np.ascontiguousarray(
            residuals.reshape(n, self.m, dsub).transpose(1, 0, 2)
        )
        self._codebooks = train_kmeans_multi(subs, ksub_eff, iters=iters, seed=seed + 1)
        self._staged = None
        self._staged_refine = None
        self._cap_valid = False
        self._tail = None
        self._restage_needed = False

    def _reencode_all_device(self) -> None:
        """Retrain support in device mode: raw rows (refine store /
        chunks) re-encode under the new quantizer. refine=False indexes
        cannot re-encode (no raw rows survive) — the codes stay valid
        for the OLD quantizer, so retraining them is rejected."""
        if not self.refine:
            raise ValueError(
                "retraining a refine=False device-mode IVFPQIndex would "
                "orphan its codes (raw vectors are not retained); build "
                "a fresh index instead"
            )
        vecs, idsa = self._raw_rows_all()
        assign, codes = self._encode(vecs)
        self._dev_vecs.clear(); self._dev_ids.clear()
        self._dev_assign.clear(); self._dev_codes.clear()
        self._dev_vecs.append(vecs)
        self._dev_ids.append(idsa)
        self._dev_assign.append(assign)
        self._dev_codes.append(codes)

    def _encode(self, data):
        """(N, D) -> (assignments (N,), codes (N, m) uint8); numpy in ->
        numpy out, device in -> device out.

        Operates in the (optionally OPQ-rotated) quantization space."""
        if is_device_array(data):
            n = int(data.shape[0])
            data = self._rotate_device(data.astype(jnp.float32))
            assign = assign_clusters(data, self._centroids_dev(), out_device=True)
            subs = _residual_subs_program(n, self.dim, self.m)(
                data, self._centroids_dev(), assign
            )
            codes = assign_clusters_multi(
                subs, self._codebooks_dev(), out_device=True
            ).T.astype(jnp.uint8)
            return assign, codes
        data = self._rotate(data)
        centroids = np.asarray(self._centroids)
        assign = assign_clusters(data, centroids)
        residuals = data - centroids[assign]
        dsub = self.dim // self.m
        subs = np.ascontiguousarray(
            residuals.reshape(data.shape[0], self.m, dsub).transpose(1, 0, 2)
        )
        codes = assign_clusters_multi(subs, np.asarray(self._codebooks)).T.astype(np.uint8)
        return assign, np.ascontiguousarray(codes)

    # -- mutation ------------------------------------------------------------------

    def _tail_park(self, ids_dev, assign_dev, codes_dev, raw_rows_dev) -> None:
        """Post-staging add: encode-time products go to the device tail;
        raw rows go straight into the live refine store."""
        n = int(ids_dev.shape[0])
        recon = _decode_recon_program(
            n, self.dim, self.m, int(jnp.shape(self._codebooks_dev())[1])
        )(codes_dev, assign_dev, self._centroids_dev(), self._codebooks_dev())
        if self._tail is None:
            self._tail = GrowTail({
                "recon": (self.dim, "float32"),
                "ids": (None, "int32"),
                "assign": (None, "int32"),
                "codes": (self.m, "uint8"),
            }, initial_cap=tail_restage_threshold(self.ntotal))
        self._tail.append(
            recon=recon, ids=ids_dev, assign=assign_dev, codes=codes_dev
        )
        if self.refine and raw_rows_dev is not None:
            self._refine_append(raw_rows_dev, ids_dev)
        if self._tail.count > tail_restage_threshold(self.ntotal):
            self._restage_needed = True

    def _add_device(self, vectors, ids) -> None:
        vectors = vectors.reshape(-1, self.dim)
        if not is_device_array(ids):
            ids = jnp.asarray(np.asarray(ids, np.int64).astype(np.int32))
        ids = ids.astype(jnp.int32).reshape(-1)
        if not self.is_trained:
            self.train(vectors)
        assign, codes = self._encode(vectors)
        kept = vectors.astype(
            jnp.bfloat16 if self.refine_dtype == "bfloat16" else jnp.float32
        ) if self.refine else None
        if self._staged is not None:
            self._tail_park(ids, assign, codes, kept)
        else:
            if self.refine:
                if self.capacity and self._staged_refine is None:
                    # Declared capacity: the refine store exists from the
                    # first add and rows scatter straight in — vector
                    # chunks are never retained (the 10M memory shape).
                    self._init_refine_empty(ids)
                if self._staged_refine is not None:
                    self._refine_append(kept, ids)
                else:
                    self._dev_vecs.append(kept)
            self._dev_ids.append(ids)
            self._dev_assign.append(assign)
            self._dev_codes.append(codes)
        self._n_dev += int(vectors.shape[0])

    def add(self, vectors, ids) -> None:
        if is_device_array(vectors) and self._mode == "host" and self.ntotal == 0:
            self._mode = "device"
        if self._mode == "device":
            if not is_device_array(vectors):
                vectors = jnp.asarray(np.ascontiguousarray(vectors, np.float32))
            self._add_device(vectors, ids)
            return
        vectors = np.ascontiguousarray(
            np.asarray(vectors), dtype=np.float32
        ).reshape(-1, self.dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        if not self.is_trained:
            self.train(vectors)
        assign, codes = self._encode(vectors)
        if self._staged is not None:
            self._tail_park(
                jnp.asarray(ids.astype(np.int32)),
                jnp.asarray(assign),
                jnp.asarray(codes),
                jnp.asarray(vectors) if self.refine else None,
            )
        elif self._staged_refine is not None and self.refine:
            self._refine_append(
                jnp.asarray(vectors), jnp.asarray(ids.astype(np.int32))
            )
        old_assign = self._assign if self._assign is not None else np.zeros((0,), np.int32)
        self._ids = np.concatenate([self._ids, ids])
        self._codes = np.concatenate([self._codes, codes], axis=0)
        self._assign = np.concatenate([old_assign, assign])
        if self.refine:
            self._vectors = np.concatenate([self._vectors, vectors], axis=0)
        if not np.all(self._ids[:-1] <= self._ids[1:]):
            order = np.argsort(self._ids, kind="stable")
            self._ids = self._ids[order]
            self._codes = self._codes[order]
            self._assign = self._assign[order]
            if self.refine:
                self._vectors = self._vectors[order]

    def reconstruct(self, doc_id: int) -> np.ndarray:
        """Return the stored vector for an external id (FAISS
        IndexIDMap2.reconstruct analog). With refine on this is the raw
        (or bf16-rounded) row; pure-code indexes return the PQ
        reconstruction centroid + decode(codes) mapped back through the
        OPQ rotation — the same approximation FAISS reconstructs from a
        PQ index. Raises KeyError if absent."""
        if self._mode == "device":
            if self._n_dev == 0:
                raise KeyError(f"id {doc_id} not in index")
            if self.refine:
                vecs, idsa = self._raw_rows_all()
                pos = np.nonzero(np.asarray(idsa) == int(doc_id))[0]
                if not len(pos):
                    raise KeyError(f"id {doc_id} not in index")
                return np.asarray(vecs[int(pos[0])].astype(jnp.float32))
            idsa, assign, codes = self._codes_all()
            pos = np.nonzero(np.asarray(idsa) == int(doc_id))[0]
            if not len(pos):
                raise KeyError(f"id {doc_id} not in index")
            p = int(pos[0])
            recon = _decode_recon_program(
                1, self.dim, self.m, int(jnp.shape(self._codebooks_dev())[1])
            )(codes[p : p + 1], assign[p : p + 1],
              self._centroids_dev(), self._codebooks_dev())
            out = np.asarray(recon[0])
            return out @ self._rotation.T if self._rotation is not None else out
        pos = np.searchsorted(self._ids, int(doc_id))
        if pos >= self._ids.shape[0] or self._ids[pos] != doc_id:
            raise KeyError(f"id {doc_id} not in index")
        if self.refine:
            return self._vectors[pos].copy()
        centroids = np.asarray(self._centroids, np.float32)
        codebooks = np.asarray(self._codebooks, np.float32)
        dsub = self.dim // self.m
        y = np.concatenate([
            codebooks[j, int(self._codes[pos, j])] for j in range(self.m)
        ])
        recon = centroids[int(self._assign[pos])] + y.reshape(self.dim)
        return recon @ self._rotation.T if self._rotation is not None else recon

    def remove_ids(self, ids) -> int:
        """Remove stored rows by external id; returns how many were
        removed (the FAISS IndexIDMap2.remove_ids analog).

        Host mode filters the mirrors and re-stages lazily (O(n), the
        FAISS cost class). Device mode removes IN PLACE: the tail folds
        in, then one device pass turns matching list ids to -1 with +inf
        item constants (the ADC exclusion marker) and invalidates the
        refine-store slots — no rebuild, no host traffic."""
        if self._mode == "device":
            from .devbuild import apply_removal, removal_table

            if self._n_dev == 0:
                return 0
            if self._staged is not None and self._tail and self._tail.count:
                self._restage_needed = True
            self._stage()  # folds chunks/tail; rows now live in the canvases
            (centroids, c_sq, codebooks, list_codes, li, codes128,
             item_const, pad) = self._staged
            table = removal_table(ids)
            li, removed, item_const = apply_removal(li, table, item_const)
            if removed:
                self._staged = (
                    centroids, c_sq, codebooks, list_codes, li, codes128,
                    item_const, pad,
                )
                if self.refine and self._staged_refine is not None:
                    store, lookup, ids_arr, valid = self._staged_refine
                    ids_arr, _ = apply_removal(ids_arr, table)
                    self._staged_refine = (
                        store, lookup, ids_arr, valid & (ids_arr >= 0)
                    )
                self._n_dev -= removed
                self._mask_cache.clear()
            return removed
        ids = np.unique(np.asarray(ids, dtype=np.int64).reshape(-1))
        keep = ~np.isin(self._ids, ids)
        removed = int(self._ids.shape[0] - keep.sum())
        if removed:
            self._ids = self._ids[keep]
            self._codes = self._codes[keep]
            if self._assign is not None:
                self._assign = self._assign[keep]
            if self.refine:
                self._vectors = self._vectors[keep]
            self._staged = None
            self._staged_refine = None
            self._cap_valid = False
            self._tail = None
            self._restage_needed = False
            self._mask_cache.clear()
        return removed

    # -- device staging ----------------------------------------------------------------

    def _codes_all(self):
        """Device mode: every stored row's (ids, assign, codes) as device
        arrays — from the staged canvas, the tail, and pending chunks."""
        parts_i, parts_a, parts_c = [], [], []
        if self._staged is not None:
            ids_s, assign_s, codes_s = self._staged_codes_rows()
            if ids_s is not None:
                parts_i.append(ids_s)
                parts_a.append(assign_s)
                parts_c.append(codes_s)
        if self._tail and self._tail.count:
            c = self._tail.count
            parts_i.append(self._tail["ids"][:c])
            parts_a.append(self._tail["assign"][:c])
            parts_c.append(self._tail["codes"][:c])
        if len(self._dev_ids):
            parts_i.append(self._dev_ids.consolidated(jnp.int32))
            parts_a.append(self._dev_assign.consolidated(jnp.int32))
            parts_c.append(self._dev_codes.consolidated(jnp.uint8))
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps)
        return cat(parts_i), cat(parts_a), cat(parts_c)

    def _staged_codes_rows(self):
        """Rows held by the current staging, reconstructed from the code
        canvas (device mode never retains a row-major code matrix)."""
        from ..ops.adc_pallas import unstage_codes128_device

        n_staged = self._n_dev - len(self._dev_ids) - (
            self._tail.count if self._tail else 0
        )
        if n_staged <= 0:
            return None, None, None
        (_, _, _, list_codes, list_ids, codes128, _, pad) = self._staged
        nlist_eff = int(self._staged[0].shape[0])
        if list_codes is None:
            list_codes = unstage_codes128_device(
                codes128, self.m, int(jnp.shape(self._codebooks_dev())[1])
            )
        from .ivf_flat import _extract_rows_program

        codes, ids_s, assign_s = _extract_rows_program(
            nlist_eff, pad, self.m, n_staged, str(list_codes.dtype)
        )(list_codes, list_ids)
        return ids_s, assign_s, codes

    def _raw_rows_all(self):
        """Device mode, refine on: every raw (kept-dtype) row + id.

        Invariant: once `_staged_refine` exists it is COMPLETE (built
        from every chunk, kept current by _refine_append), so it is the
        sole source; before it exists the chunks are."""
        if self._staged_refine is not None:
            vecs, _, ids_arr, valid = self._staged_refine
            n_mat = int(np.asarray(jnp.sum(valid)))
            if n_mat == 0:
                raise ValueError("empty refine store")
            from .ivf_flat import _extract_rows_program

            v, i, _ = _extract_rows_program(
                1, int(vecs.shape[0]), self.dim, n_mat, str(vecs.dtype)
            )(vecs.reshape(1, -1, self.dim), ids_arr.reshape(1, -1))
            return v, i
        if not len(self._dev_vecs):
            raise ValueError("no raw rows retained (refine=False device mode)")
        return (
            self._dev_vecs.consolidated(),
            self._dev_ids.consolidated(jnp.int32),
        )

    def _stage(self):
        if self._staged is None or self._restage_needed:
            if self._mode == "device":
                self._stage_device()
            else:
                self._stage_host()
            self._tail = None
            self._restage_needed = False
            self._mask_cache.clear()  # masked copies derive from staged arrays
        return self._staged

    def _stage_device(self):
        """Bucket codes into the padded canvases entirely on device —
        only the (nlist,) counts cross the host link (the recipe of
        benchmarks/run10m.py, productized; VERDICT r3 #1/weak #3)."""
        from ..ops.adc_pallas import (
            build_item_constants_device, stage_codes128_device,
        )

        from .devbuild import corpus_geometry

        # Build the refine store BEFORE consuming the chunks (in device
        # mode the chunks are freed below; the refine store then holds
        # the only raw copies).
        if self.refine and self._staged_refine is None:
            self._stage_refine()
        idsa, assign, codes = self._codes_all()
        nlist_eff = int(self._centroids_dev().shape[0])
        ksub_eff = int(jnp.shape(self._codebooks_dev())[1])
        order, lists, slots, counts = bucketize_device(assign, nlist_eff)
        self._geometry = corpus_geometry(counts, self.pad_cap)
        if self.pad_cap and int(counts.max(initial=0)) > self.pad_cap:
            # Residual codes are only valid for the list they were
            # encoded against — capped staging re-encodes rows from
            # the refine store under the capped assignment. When the
            # previous staging was already capped, only the NEW rows
            # (tail/chunks — they follow the staged rows in _codes_all
            # order) re-place and re-encode against the remaining
            # per-list space (VERDICT r4 weak #5: the full-corpus
            # capped_assign measured 31 s at 1M zipf).
            n = int(idsa.shape[0])
            n_base = (
                self._n_dev
                - len(self._dev_ids)
                - (self._tail.count if self._tail else 0)
                if self._cap_valid else 0
            )
            done = False
            if 0 < n_base < n:
                base_assign = assign[:n_base].astype(jnp.int32)
                base_counts = np.asarray(
                    jnp.zeros((nlist_eff,), jnp.int32)
                    .at[base_assign].add(1)
                )
                if int(base_counts.max(initial=0)) <= self.pad_cap:
                    try:
                        new_assign, new_codes = (
                            self._capped_reencode_incremental(
                                idsa[n_base:], base_counts
                            )
                        )
                        assign = jnp.concatenate([base_assign, new_assign])
                        codes = jnp.concatenate(
                            [codes[:n_base], new_codes]
                        )
                        done = True
                    except ValueError:
                        pass  # not enough free slots: full reassign
            if not done:
                assign, codes = self._capped_reencode(idsa)
            order, lists, slots, counts = bucketize_device(assign, nlist_eff)
        self._cap_valid = bool(self.pad_cap)
        pad = list_pad(int(counts.max(initial=1)))
        list_codes = scatter_lists_device(
            codes, order, lists, slots, nlist_eff, pad
        )
        li_dev = scatter_list_ids_device(
            idsa, order, lists, slots, nlist_eff, pad
        )
        c_sq = jnp.sum(self._centroids_dev().astype(jnp.float32) ** 2, axis=1)
        # order/lists/slots carry n_pad entries; padded entries gather a
        # clamped (garbage) constant and scatter out of bounds (dropped).
        item_const = build_item_constants_device(
            self._centroids_dev(), assign, codes, self._codebooks_dev(),
            order, lists, slots, nlist_eff, pad,
        )
        codes128 = stage_codes128_device(list_codes, self.m, ksub_eff)
        keep_unpacked = jax.default_backend() != "tpu" or not (
            ksub_eff == 256 or (ksub_eff == 16 and self.m % 2 == 0)
        )
        self._staged = (
            self._centroids_dev().astype(jnp.float32),
            c_sq,
            self._codebooks_dev(),
            list_codes if keep_unpacked else None,
            li_dev,
            codes128,
            item_const,
            pad,
        )
        self._dev_vecs.clear()
        self._dev_ids.clear()
        self._dev_assign.clear()
        self._dev_codes.clear()

    def _refine_rows_of(self, idsa):
        """Gather raw (rotated-space) rows for the given ids from the
        refine store."""
        vecs, lookup, _, _ = self._stage_refine()
        if lookup == ("identity",):
            rows = vecs[idsa]
        elif lookup[0] == "dense":
            rows = vecs[lookup[1][idsa]]
        else:  # searchsorted layout
            _, ids_search, row_of_pos = lookup
            rows = vecs[row_of_pos[jnp.searchsorted(ids_search, idsa)]]
        return self._rotate_device(rows.astype(jnp.float32))

    def _encode_residuals(self, rows_rot, assign):
        subs = _residual_subs_program(
            int(rows_rot.shape[0]), self.dim, self.m
        )(rows_rot, self._centroids_dev(), assign)
        return assign_clusters_multi(
            subs, self._codebooks_dev(), out_device=True
        ).T.astype(jnp.uint8)

    def _capped_reencode(self, idsa):
        """Capped-assignment re-encode from the refine store's raw rows
        (in idsa order): devbuild.capped_assign relocates over-cap rows,
        then residuals re-encode against the NEW list centroids. Returns
        device (assign, codes)."""
        from .devbuild import capped_assign

        rows_rot = self._refine_rows_of(idsa)
        assign, _moved = capped_assign(
            rows_rot, self._centroids_dev(), self.pad_cap
        )
        return assign, self._encode_residuals(rows_rot, assign)

    def _capped_reencode_incremental(self, new_ids, base_counts):
        """Incremental cap maintenance: place + encode ONLY the new
        rows against the remaining per-list capacity; already-staged
        rows keep their lists and codes. Raises ValueError when the
        remaining space cannot hold them (caller falls back to the
        full _capped_reencode)."""
        from .devbuild import capped_assign_incremental

        rows_rot = self._refine_rows_of(new_ids)
        assign, _moved = capped_assign_incremental(
            rows_rot, self._centroids_dev(), base_counts, self.pad_cap
        )
        return assign, self._encode_residuals(rows_rot, assign)

    def _stage_host(self):
        from .devbuild import corpus_geometry

        nlist_eff = np.asarray(self._centroids).shape[0]
        assign_eff = self._assign
        codes_eff = self._codes
        counts = np.bincount(assign_eff, minlength=nlist_eff)
        self._geometry = corpus_geometry(counts, self.pad_cap)
        if self.pad_cap and int(counts.max(initial=0)) > self.pad_cap:
            from .devbuild import capped_assign

            data_rot = self._rotate(self._vectors)
            assign_dev, _moved = capped_assign(
                jnp.asarray(data_rot), np.asarray(self._centroids, np.float32),
                self.pad_cap,
            )
            assign_eff = np.asarray(assign_dev)
            residuals = data_rot - np.asarray(self._centroids)[assign_eff]
            dsub = self.dim // self.m
            subs = np.ascontiguousarray(
                residuals.reshape(-1, self.m, dsub).transpose(1, 0, 2)
            )
            codes_eff = assign_clusters_multi(
                subs, np.asarray(self._codebooks)
            ).T.astype(np.uint8)
            counts = np.bincount(assign_eff, minlength=nlist_eff)
        pad = list_pad(int(counts.max(initial=1)))
        # uint8 on device: the whole padded code table is pad*nlist*m bytes
        list_codes = np.zeros((nlist_eff, pad, self.m), np.uint8)
        list_ids = np.full((nlist_eff, pad), -1, np.int32)
        order = np.argsort(assign_eff, kind="stable")
        sorted_lists = assign_eff[order]
        starts = np.zeros((nlist_eff,), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        slots = np.arange(len(order)) - starts[sorted_lists]
        list_codes[sorted_lists, slots] = codes_eff[order]
        list_ids[sorted_lists, slots] = self._ids[order]
        centroids = np.asarray(self._centroids, dtype=np.float32)
        codebooks = np.asarray(self._codebooks, dtype=np.float32)
        c_sq = np.einsum("nd,nd->n", centroids, centroids)

        # Pallas ADC layout: codes padded to 128 subspace lanes + the
        # per-item constant (ops/adc_pallas.py docstring).
        from ..ops.adc_pallas import CODE_LANES, build_item_constants

        codes128 = np.zeros((nlist_eff, CODE_LANES, pad), np.uint8)
        codes128[:, : self.m, :] = list_codes.transpose(0, 2, 1)
        ksub_eff = codebooks.shape[1]
        if ksub_eff == 16 and self.m % 2 == 0:
            # 4-bit codebooks: nibble-pack for the Pallas route —
            # m/2 bytes/vector on device and half the per-step code
            # DMA (Quick-ADC storage; ops/adc_pallas._qdot_nibble).
            from ..ops.adc_pallas import pack_nibbles

            codes128 = pack_nibbles(codes128)
        item_const = build_item_constants(
            centroids, assign_eff, codes_eff, codebooks,
            order, sorted_lists, slots, nlist_eff, pad,
        )
        self._staged = (
            jax.device_put(centroids),
            jax.device_put(c_sq.astype(np.float32)),
            jax.device_put(codebooks),
            jax.device_put(list_codes),
            jax.device_put(list_ids),
            jax.device_put(codes128),
            jax.device_put(item_const),
            pad,
        )

    # -- search -----------------------------------------------------------------------

    def search(
        self, queries, k: int, *, nprobe: int | None = None, id_mask=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """id_mask: optional (cap,) bool keyed by EXTERNAL id — metadata
        filter pushdown (models/flat.py search docstring). Masked rows
        take a +inf per-item ADC constant (the kernels' exclusion
        marker) via a once-per-mask staged copy — filtered scans run at
        full speed. Pass the SAME mask array across calls to reuse the
        staging."""
        if is_device_array(queries):
            queries = queries.astype(jnp.float32).reshape(-1, self.dim)
        else:
            queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(
                -1, self.dim
            )
        if self.ntotal == 0 or not self.is_trained:
            shape = (queries.shape[0], k)
            return np.full(shape, np.inf, np.float32), np.full(shape, -1, np.int64)
        # Coarse probing + ADC run in the (rotated) quantization space; the
        # exact refine stays in the ORIGINAL space (rotation preserves L2,
        # and the refine store keeps raw vectors).
        q_adc = self._rotate_queries(queries)
        (
            centroids, c_sq, codebooks, list_codes, list_ids,
            codes128, item_const, pad,
        ) = self._stage()
        keep_rows = None
        if id_mask is not None:
            from .devbuild import mask_norms, mask_rows

            def _build():
                return (
                    mask_norms(item_const, list_ids, id_mask),
                    mask_rows(list_ids, id_mask),
                )

            item_const, keep_rows = self._mask_cache.get(id_mask, _build)
        nlist_eff = centroids.shape[0]
        ksub_eff = codebooks.shape[1]
        nprobe_eff = min(nprobe or self.nprobe, nlist_eff)
        k_adc = min(k * self.refine_factor, self.ntotal) if self.refine else k
        k_adc = max(k_adc, k)
        # Pallas ADC runs for 8-bit codebooks (hi/lo one-hot) AND 4-bit
        # ones (ksub=16, even m — the Quick-ADC point: codes stage
        # nibble-PACKED at m/2 bytes/vector and the kernel unpacks in
        # two VPU ops per packed row). Other shapes fall back to XLA.
        if jax.default_backend() == "tpu" and (
            ksub_eff == 256 or (ksub_eff == 16 and self.m % 2 == 0)
        ):
            if self.refine and k_adc > 2 * LANE_K:
                # Deep shortlists: the in-kernel sorted-insertion top-k
                # costs ~k_adc VPU rounds per probe; the dense-output ADC
                # + XLA top_k is far cheaper and the refine re-sorts
                # exactly anyway (ops/adc_pallas.adc_dense_search_program).
                from ..ops.adc_pallas import adc_dense_search_program

                program = adc_dense_search_program(
                    nlist_eff, pad, self.dim, self.m, ksub_eff,
                    queries.shape[0], nprobe_eff, k_adc,
                )
            else:
                from ..ops.adc_pallas import adc_full_search_program

                program = adc_full_search_program(
                    nlist_eff, pad, self.dim, self.m, ksub_eff,
                    queries.shape[0], nprobe_eff, k_adc,
                )
            dists, out_ids = program(
                centroids, c_sq, codebooks, codes128, item_const, list_ids, q_adc
            )
            if id_mask is not None:
                # Masked rows can pad the shortlist as +inf entries with
                # REAL ids; the refine would re-score them finitely and
                # leak them (devbuild.mask_shortlist_ids).
                from .devbuild import mask_shortlist_ids

                out_ids = mask_shortlist_ids(out_ids, id_mask)
        else:
            if list_codes is None:
                from ..ops.adc_pallas import unstage_codes128_device

                list_codes = unstage_codes128_device(codes128, self.m, ksub_eff)
            program = _adc_search_program(
                nlist_eff, pad, self.dim, self.m, ksub_eff,
                queries.shape[0], nprobe_eff, k_adc,
                masked=id_mask is not None,
            )
            if id_mask is not None:
                dists, out_ids = program(
                    centroids, c_sq, codebooks, list_codes, list_ids, q_adc,
                    keep_rows,
                )
            else:
                dists, out_ids = program(
                    centroids, c_sq, codebooks, list_codes, list_ids, q_adc
                )
        if self._tail and self._tail.count:
            # Incremental-add rows join the shortlist scored by the SAME
            # estimator (exact distance to their ADC reconstruction ==
            # the ADC estimate), masked to the probed lists — so the
            # merged shortlist equals a fresh build's.
            td = tail_scores(
                self._tail, centroids, c_sq, jnp.asarray(q_adc), nprobe_eff,
                vec_field="recon",
            )
            if id_mask is not None:
                from .devbuild import mask_rows as _mask_rows

                td = jnp.where(
                    _mask_rows(self._tail["ids"], id_mask)[None, :], td, jnp.inf
                )
            dists, out_ids = merge_tail(
                dists, out_ids, td, self._tail["ids"], k_adc
            )
        if self.refine:
            # Rerank consumes the device shortlist directly — no host
            # trip. An id-indexed refine store stages lookup
            # ("identity",), which exact_rerank_staged dispatches to the
            # rows-mode rerank (ids ARE rows — no table gather).
            vecs, id_lookup, _, _ = self._stage_refine()
            out_d, out_i = exact_rerank_staged(
                vecs, id_lookup, out_ids.astype(jnp.int32),
                jnp.asarray(queries), k,
            )
            return np.asarray(out_d), np.asarray(out_i, dtype=np.int64)
        return np.asarray(dists)[:, :k], np.asarray(out_ids, dtype=np.int64)[:, :k]

    # -- refine store -------------------------------------------------------------------

    def _stage_refine(self):
        """Refine-store device buffers: (vectors, id_lookup, ids, valid).

        Vectors pad to pow2 capacity so growth reuses executables; the
        id -> row lookup comes from ops/rerank.build_id_lookup. In device
        mode the store builds from the device chunks directly (scatter,
        no host traffic) and is updated IN PLACE by incremental adds."""
        if self._staged_refine is None:
            if self._mode == "device":
                self._stage_refine_device()
            else:
                self._stage_refine_host()
        return self._staged_refine

    def _refine_layout(self, ids_np_or_max, ntotal: int):
        """Shared id-indexed vs positional gate (ADVICE r3: compare the
        ACTUAL staged capacities — id-indexed only when its pow2 cap is
        <= 2x the positional pow2 cap). A declared `capacity` replaces
        pow2 growth with one exact 128-aligned allocation."""
        max_id = int(ids_np_or_max)
        if self.capacity:
            align = lambda x: ((max(x, 1) + 127) // 128) * 128
            pos_cap = align(max(self.capacity, ntotal))
            id_cap = align(max_id + 1)
            if id_cap <= 2 * pos_cap:
                # Room for future in-capacity iota ids either way.
                return "identity", max(id_cap, pos_cap)
            return "positional", pos_cap
        pos_cap = next_pow2(max(ntotal, 1))
        if ntotal and next_pow2(max_id + 1) <= 2 * pos_cap:
            return "identity", next_pow2(max_id + 1)
        return "positional", pos_cap

    def _stage_refine_host(self):
        from ..ops.rerank import build_id_lookup

        dtype = np.float32 if self.refine_dtype == "float32" else jnp.bfloat16
        ids_i = self._ids.astype(np.int64)
        max_id = int(ids_i.max(initial=-1))
        layout, cap = self._refine_layout(max_id, self.ntotal)
        if layout == "identity":
            # TIGHT id space: stage the store ID-INDEXED (row ==
            # external id), so the refine gathers rows straight from
            # the shortlist ids — no id->row table gather, which is
            # issue-bound at ~13 ns/element and costs as much as the
            # row gather itself (ops/rerank.rerank_program_rows;
            # ~330 us/batch at a B=128 top-200 shortlist). Unlike
            # the 4-byte/slot lookup table (64x gate), empty slots
            # here cost a full dim*4-byte vector row, so the gate
            # compares the ACTUAL staged capacities (<= 2x the
            # positional pow2 cap — comparing raw counts instead can
            # admit ~4x at pow2 boundaries, ADVICE r3); gappier id
            # spaces keep the positional store + table below.
            vecs = np.zeros((cap, self.dim), np.float32)
            vecs[ids_i] = self._vectors
            ids = np.full((cap,), -1, np.int32)
            ids[ids_i] = ids_i.astype(np.int32)
            valid = np.zeros((cap,), bool)
            valid[ids_i] = True
            lookup = ("identity",)  # ids ARE rows (ops/rerank)
            self._refine_rows = 0
        else:  # gappy/sparse ids: positional store + id lookup
            vecs = np.zeros((cap, self.dim), np.float32)
            vecs[: self.ntotal] = self._vectors
            ids = np.full((cap,), -1, np.int32)
            ids[: self.ntotal] = self._ids.astype(np.int32)
            valid = np.zeros((cap,), bool)
            valid[: self.ntotal] = True
            lookup = build_id_lookup(self._ids)
            self._refine_rows = self.ntotal
        self._staged_refine = (
            jax.device_put(jnp.asarray(vecs, dtype=dtype)),
            lookup,
            jax.device_put(ids),
            jax.device_put(valid),
        )

    def _init_refine_empty(self, first_ids) -> None:
        """Declared-capacity device mode: allocate the refine store once
        (128-aligned capacity, no pow2 growth) before any row lands."""
        max_id = int(jnp.max(first_ids))
        layout, cap = self._refine_layout(max_id, 0)
        dtype = "bfloat16" if self.refine_dtype == "bfloat16" else "float32"
        store = jnp.zeros((cap, self.dim), jnp.dtype(dtype))
        ids_arr = jnp.full((cap,), -1, jnp.int32)
        valid = jnp.zeros((cap,), bool)
        if layout == "identity":
            lookup = ("identity",)
            self._refine_rows = 0
        else:
            lookup = ("dense", jnp.zeros((128,), jnp.int32))
            self._refine_rows = 0
        self._staged_refine = (store, lookup, ids_arr, valid)

    def _stage_refine_device(self):
        """Builds the refine store CHUNK-WISE with donated updates: a
        consolidated corpus copy next to the store would double peak
        HBM and OOM a 10M x 384 build beside the 7.7 GB bf16 store (the
        run10m.py memory discipline, productized). Only the (n,) id
        chunks consolidate."""
        from .devbuild import build_id_lookup_device

        idsa = self._dev_ids.consolidated(jnp.int32)
        n = len(self._dev_vecs)
        dtype = "bfloat16" if self.refine_dtype == "bfloat16" else "float32"
        max_id = int(jnp.max(idsa)) if n else -1
        layout, cap = self._refine_layout(max_id, n)
        if layout == "identity":
            lookup = ("identity",)
            self._refine_rows = 0
        else:
            lookup = build_id_lookup_device(idsa)
            if lookup[0] == "identity":
                # ids are iota: positional IS id-indexed here.
                lookup = ("identity",)
            self._refine_rows = n
        store = jnp.zeros((cap, self.dim), jnp.dtype(dtype))
        ids_arr = jnp.full((cap,), -1, jnp.int32)
        valid = jnp.zeros((cap,), bool)
        ofs = 0
        id_chunks = list(self._dev_ids._chunks)
        for vchunk, ichunk in zip(self._dev_vecs.drain(), id_chunks):
            b = int(vchunk.shape[0])
            ichunk = ichunk.astype(jnp.int32)
            positions = (
                ichunk if layout == "identity"
                else jnp.arange(ofs, ofs + b, dtype=jnp.int32)
            )
            store = _refine_update_program(cap, self.dim, b, dtype)(
                store, vchunk, positions
            )
            del vchunk  # drain() consumed it: peak = store + remaining chunks
            ids_arr, valid = _refine_meta_update_program(cap, b)(
                ids_arr, valid, positions, ichunk
            )
            ofs += b
        self._staged_refine = (store, lookup, ids_arr, valid)

    def _refine_append(self, rows_dev, ids_dev) -> None:
        """Scatter freshly-added raw rows into the LIVE refine store
        (donated in-place updates, O(batch)); grows pow2 on demand."""
        vecs, lookup, ids_arr, valid = self._staged_refine
        cap = int(vecs.shape[0])
        dtype = str(vecs.dtype)
        batch = int(ids_dev.shape[0])
        new_total = self.ntotal + batch  # ntotal not yet bumped by caller
        if lookup == ("identity",):
            max_new = int(jnp.max(ids_dev))
            if max_new >= cap:
                need = next_pow2(max_new + 1)
                if need > 2 * next_pow2(max(new_total, 1)):
                    # Gate broken by gappy growth: rebuild positional.
                    self._refine_rebuild_positional(rows_dev, ids_dev)
                    return
                vecs = _pad_rows_to_program(cap, need, self.dim, dtype)(vecs)
                ids_arr, valid = _pad_meta_to_program(cap, need)(ids_arr, valid)
                cap = need
            positions = ids_dev
        elif lookup[0] == "sparse":
            # searchsorted layout cannot absorb appends: rebuild.
            self._refine_rebuild_positional(rows_dev, ids_dev)
            return
        else:  # positional store + dense id->row table
            start = self._refine_rows
            if start + batch > cap:
                need = next_pow2(start + batch)
                vecs = _pad_rows_to_program(cap, need, self.dim, dtype)(vecs)
                ids_arr, valid = _pad_meta_to_program(cap, need)(ids_arr, valid)
                cap = need
            positions = jnp.arange(start, start + batch, dtype=jnp.int32)
            self._refine_rows = start + batch
            table = lookup[1]
            max_new = int(jnp.max(ids_dev))
            if max_new >= int(table.shape[0]):
                table = jnp.pad(
                    table, (0, next_pow2(max_new + 1) - int(table.shape[0]))
                )
            lookup = ("dense", table.at[ids_dev].set(positions))
        vecs = _refine_update_program(cap, self.dim, batch, dtype)(
            vecs, rows_dev, positions
        )
        ids_arr, valid = _refine_meta_update_program(cap, batch)(
            ids_arr, valid, positions, ids_dev
        )
        self._staged_refine = (vecs, lookup, ids_arr, valid)

    def _refine_rebuild_positional(self, rows_dev, ids_dev) -> None:
        """Fallback when an append breaks the id-indexed gate: compact
        the existing store + the new rows into a positional layout."""
        from .devbuild import build_id_lookup_device
        from .ivf_flat import _extract_rows_program

        vecs, _, ids_arr, valid = self._staged_refine
        n_old = int(np.asarray(jnp.sum(valid)))
        dtype = str(vecs.dtype)
        if n_old:
            old_v, old_i, _ = _extract_rows_program(
                1, int(vecs.shape[0]), self.dim, n_old, dtype
            )(vecs.reshape(1, -1, self.dim), ids_arr.reshape(1, -1))
            all_v = jnp.concatenate([old_v, rows_dev.astype(old_v.dtype)])
            all_i = jnp.concatenate([old_i, ids_dev])
        else:
            all_v, all_i = rows_dev, ids_dev
        n = int(all_v.shape[0])
        cap = next_pow2(max(n, 1))
        positions = jnp.arange(n, dtype=jnp.int32)
        store, ids_new, valid_new = _refine_scatter_program(
            cap, self.dim, n, "bfloat16" if dtype == "bfloat16" else "float32"
        )(all_v, positions, all_i)
        self._refine_rows = n
        self._staged_refine = (
            store, build_id_lookup_device(all_i, positions), ids_new, valid_new
        )

    # -- full ranking -----------------------------------------------------------------

    def ranked_all_device(self, query: np.ndarray):
        """Full exact ranking over the refine store, left ON DEVICE:
        (dists, ids_i32, n) — the recall CLI streams it chunk-wise
        (models/flat.py docstring). Returns None for pure-code indexes
        (refine=False), whose full ranking is the chunked-ADC +
        host-tail-merge ranked_all — callers fall back to that."""
        if not self.refine:
            return None
        from ..ops.distances import ranked_program

        query = np.ascontiguousarray(query, dtype=np.float32).reshape(self.dim)
        vecs, _, ids, valid = self._stage_refine()
        dists, out_ids = ranked_program(vecs.shape[0], self.dim)(
            vecs.astype(jnp.float32), ids, valid, jnp.asarray(query)
        )
        return dists, out_ids, self.ntotal

    def ranked_many_device(self, queries: np.ndarray):
        """Batched ranked_all_device: (dists (B, cap), ids (B, cap), n) —
        one device program per batch (models/flat.py docstring). None for
        pure-code indexes, like ranked_all_device; callers fall back to
        per-query ranking."""
        if not self.refine:
            return None
        from ..ops.distances import ranked_many_program

        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(
            -1, self.dim
        )
        vecs, _, ids, valid = self._stage_refine()
        dists, out_ids = ranked_many_program(
            vecs.shape[0], self.dim, queries.shape[0]
        )(vecs.astype(jnp.float32), ids, valid, jnp.asarray(queries))
        return dists, out_ids, self.ntotal

    def ranked_all(self, query: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Full exact ranking of every stored vector.

        With refine on (the default) this is an exact elementwise scan of
        the refine store — bounded and precise at any ntotal (fixes the
        round-1 k=ntotal ADC blowup, VERDICT weak #6). Pure-code indexes
        rank every code via a chunked dense ADC scan + one lexicographic
        sort — bounded memory at any ntotal (VERDICT round 2, weak #7;
        the old path requested a k=ntotal in-kernel shortlist)."""
        if self.ntotal == 0:
            return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
        if self.refine:
            dists, out_ids, n = self.ranked_all_device(query)
            return np.asarray(dists)[:n], np.asarray(out_ids, dtype=np.int64)[:n]
        query = np.ascontiguousarray(query, dtype=np.float32).reshape(self.dim)
        q_adc = np.asarray(self._rotate_queries(query.reshape(1, self.dim)))[0]
        (
            centroids, _, codebooks, list_codes, list_ids, codes128, _, pad
        ) = self._stage()
        if list_codes is None:
            from ..ops.adc_pallas import unstage_codes128_device

            list_codes = unstage_codes128_device(
                codes128, self.m, int(codebooks.shape[1])
            )
        program = _adc_ranked_program(
            int(centroids.shape[0]), pad, self.dim, self.m,
            int(codebooks.shape[1]),
        )
        dists, out_ids = program(
            centroids, codebooks, list_codes, list_ids, jnp.asarray(q_adc)
        )
        n = self.ntotal
        dists = np.asarray(dists)[:n]
        out_ids = np.asarray(out_ids, dtype=np.int64)[:n]
        if self._tail and self._tail.count:
            # ranked_all is exhaustive: tail rows merge UNMASKED, scored
            # by the same ADC estimate (exact distance to reconstruction).
            c = self._tail.count
            recon = self._tail["recon"][:c]
            tq = jnp.asarray(q_adc, dtype=jnp.float32)
            td = np.asarray(jnp.sum((recon - tq[None, :]) ** 2, axis=1))
            ti = np.asarray(self._tail["ids"][:c], dtype=np.int64)
            alld = np.concatenate([dists, td])
            alli = np.concatenate([out_ids, ti])
            perm = np.lexsort((alli, alld))
            dists, out_ids = alld[perm][:n], alli[perm][:n]
        return dists, out_ids

    # -- serialization --------------------------------------------------------------------

    def state(self) -> tuple[dict[str, Any], dict[str, np.ndarray]]:
        params = {
            "dim": self.dim, "nlist": self.nlist, "nprobe": self.nprobe,
            "m": self.m, "ksub": self.ksub,
            "refine": self.refine, "refine_factor": self.refine_factor,
            "refine_dtype": self.refine_dtype,
            "opq": self.opq, "opq_iters": self.opq_iters,
            "capacity": self.capacity, "pad_cap": self.pad_cap,
        }
        empty_books = np.zeros((self.m, 0, self.dim // self.m), np.float32)
        if self._mode == "device" and self.ntotal:
            # Serialization crosses the host link — the ONE place device
            # mode pays it. Codes come back out of the canvas; raw rows
            # (refine only) out of the refine store, id-aligned.
            idsa, assign, codes = self._codes_all()
            ids_np = np.asarray(idsa).astype(np.int64)
            order = np.argsort(ids_np, kind="stable")
            vectors = np.zeros((0, self.dim), np.float32)
            if self.refine:
                raw_v, raw_i = self._raw_rows_all()
                raw_v = np.asarray(raw_v.astype(jnp.float32))
                raw_i = np.asarray(raw_i)
                sorter = np.argsort(raw_i, kind="stable")
                pos = sorter[np.searchsorted(raw_i, ids_np[order], sorter=sorter)]
                vectors = raw_v[pos]
            arrays = {
                "ids": ids_np[order],
                "codes": np.asarray(codes)[order],
                "assign": np.asarray(assign)[order],
                "centroids": np.asarray(self._centroids, dtype=np.float32),
                "codebooks": np.asarray(self._codebooks, dtype=np.float32),
                "vectors": vectors,
                "rotation": self._rotation
                if self._rotation is not None
                else np.zeros((0, self.dim), np.float32),
            }
            return params, arrays
        arrays = {
            "ids": self._ids,
            "codes": self._codes,
            "assign": self._assign if self._assign is not None else np.zeros((0,), np.int32),
            "centroids": np.asarray(self._centroids, np.float32)
            if self._centroids is not None
            else np.zeros((0, self.dim), np.float32),
            "codebooks": np.asarray(self._codebooks, np.float32)
            if self._codebooks is not None
            else empty_books,
            "vectors": self._vectors,
            "rotation": self._rotation
            if self._rotation is not None
            else np.zeros((0, self.dim), np.float32),
        }
        return params, arrays

    @classmethod
    def from_state(cls, params: dict[str, Any], arrays: dict[str, np.ndarray]) -> "IVFPQIndex":
        index = cls(
            dim=int(params["dim"]), nlist=int(params["nlist"]),
            nprobe=int(params["nprobe"]), m=int(params["m"]), ksub=int(params["ksub"]),
            refine=bool(params.get("refine", False)),
            refine_factor=int(params.get("refine_factor", 4)),
            refine_dtype=str(params.get("refine_dtype", "float32")),
            opq=bool(params.get("opq", False)),
            opq_iters=int(params.get("opq_iters", 8)),
            capacity=params.get("capacity"),
            pad_cap=params.get("pad_cap"),
        )
        if arrays.get("rotation") is not None and arrays["rotation"].size:
            index._rotation = np.ascontiguousarray(arrays["rotation"], np.float32)
        if "vectors" in arrays and arrays["vectors"].size:
            index._vectors = np.ascontiguousarray(arrays["vectors"], dtype=np.float32)
        if arrays["centroids"].size:
            index._centroids = np.ascontiguousarray(arrays["centroids"], dtype=np.float32)
        if arrays["codebooks"].size:
            index._codebooks = np.ascontiguousarray(arrays["codebooks"], dtype=np.float32)
        if arrays["ids"].size:
            index._ids = np.ascontiguousarray(arrays["ids"], dtype=np.int64)
            index._codes = np.ascontiguousarray(arrays["codes"], dtype=np.uint8)
            index._assign = np.ascontiguousarray(arrays["assign"], dtype=np.int32)
        return index
