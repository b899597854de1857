"""IVF-Flat index — k-means coarse quantizer + inverted-list scan.

TPU design (SURVEY.md §7 step 6): the coarse quantizer trains on device
(ops/kmeans.py); inverted lists are stored as dense padded blocks
(nlist, pad, D) so probing is a pure gather + batched VPU distance, with
no data-dependent shapes. Search is one jitted program:

  1. score query x centroids on the MXU, take top-nprobe lists
  2. lax.scan over probe ranks: gather each query's p-th list block,
     compute squared-L2 against the query, merge into the running top-k
     (exact (distance, id) lexicographic merge -> lowest-id tie-breaks)

Work is ~B * nprobe * pad * D MACs versus B * N * D for Flat — the
classic IVF trade: nprobe/nlist of the compute at recall < 1.0.

Two storage modes (models/devbuild.py):

  * HOST mode (numpy inputs — the CLI scale): raw vectors are retained
    on host; staging buckets them once and pushes the device stores.
  * DEVICE mode (first add/train input is a jax.Array — corpus scale):
    train, assignment, bucketing, scatter, and quantization all run on
    device and NO n-sized array ever crosses this container's
    1-30 MB/s host link. After staging, the bucketed store IS the
    storage (source chunks are freed); with rerank_dtype="bfloat16"
    rows are retained in bf16 — the deployment memory shape of the 10M
    benchmarks.

Incremental add (the reference's O(insert) `add_with_ids`,
/root/reference/memo_cli.py:282,437): rows added after staging park in a
device-side tail (O(batch) donated writes) that search scores exactly —
masked to the same probed lists the main scan visits — and merges
lexicographically; a full restage folds the tail in lazily once it
outgrows tail_restage_threshold. Staging is never invalidated by an add.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DIM
from ..ops.distances import ranked_many_program, ranked_program, scores_via_matmul
from ..ops.kmeans import assign_clusters, train_kmeans
from ..ops.topk import merge_topk
from .base import list_pad, next_pow2
from .devbuild import (
    ChunkStore,
    GrowTail,
    bucketize_device,
    build_id_lookup_device,
    is_device_array,
    merge_tail,
    scatter_list_ids_device,
    scatter_lists_device,
    tail_restage_threshold,
    tail_scores,
)
from .registry import register


@functools.lru_cache(maxsize=None)
def _ivf_search_program(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int,
    masked: bool = False,
):
    @jax.jit
    def run(
        centroids: jax.Array,   # (nlist, D)
        c_sq: jax.Array,        # (nlist,)
        list_vecs: jax.Array,   # (nlist, pad, D) — any float dtype
        list_ids: jax.Array,    # (nlist, pad) int32, -1 padding
        queries: jax.Array,     # (B, D)
        keep: jax.Array | None = None,  # (nlist, pad) bool when masked
    ):
        coarse = scores_via_matmul(queries, centroids.astype(jnp.float32), c_sq)
        _, probes = jax.lax.top_k(-coarse, nprobe)                # (B, nprobe)

        init = (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )

        def probe_step(carry, p):
            best_d, best_i = carry
            lists = probes[:, p]                                   # (B,)
            # Cast AFTER the gather: exact f32 distances of the stored
            # values even when the store itself is bf16 — the CPU branch
            # must rank the same value set the TPU rerank scores, not a
            # bf16-arithmetic approximation of it (VERDICT r3 weak #5).
            vecs = list_vecs[lists].astype(jnp.float32)            # (B, pad, D)
            ids = list_ids[lists]                                  # (B, pad)
            diff = vecs - queries[:, None, :].astype(jnp.float32)
            d = jnp.sum(diff * diff, axis=-1)                      # (B, pad)
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


@jax.jit
def _to_bf16(v):
    return v.astype(jnp.bfloat16)


@jax.jit
def _sq8_stage(lv, li):
    """Symmetric per-dimension SQ8 of the bucketed lists, on device.

    Scale/statistics compute in f32 whatever the store dtype (bf16
    stores in device mode quantize their bf16-rounded values — the same
    values the rerank scores). Both passes lax.scan over a handful of
    ~256 MB macro-blocks: a whole-store f32 materialization OOM'd a
    v5e at a 1M x 384 bf16 store with inflated pads, and per-LIST
    scan steps measured 17 ms each on this remote backend (140 s total
    — thousands of tiny steps are as wrong as one huge block)."""
    nlist, pad, d = lv.shape
    total = nlist * pad
    nblocks = 1
    while (
        (total // nblocks) * d * 4 > 256 * 2**20
        and total % (nblocks * 2) == 0
    ):
        nblocks *= 2
    bv = lv.reshape(nblocks, total // nblocks, d)
    bl = (li >= 0).reshape(nblocks, total // nblocks)

    def pass1(maxabs, args):
        v, l = args
        v32 = jnp.where(l[:, None], v.astype(jnp.float32), 0.0)
        return jnp.maximum(maxabs, jnp.max(jnp.abs(v32), axis=0)), None

    maxabs, _ = jax.lax.scan(pass1, jnp.zeros((d,), jnp.float32), (bv, bl))
    scale = jnp.maximum(maxabs, 1e-30) / 127.0

    def pass2(_, args):
        v, l = args
        v32 = v.astype(jnp.float32)
        codes = jnp.clip(jnp.rint(v32 / scale), -127, 127)
        dec = codes * scale
        return None, (codes.astype(jnp.int8), jnp.sum(dec * dec, axis=-1))

    _, (codes, dec_sqn) = jax.lax.scan(pass2, None, (bv, bl))
    return (
        codes.reshape(nlist, pad, d),
        scale,
        dec_sqn.reshape(nlist, pad),
    )


@functools.lru_cache(maxsize=None)
def _bucket_row_program(n_pad: int, pad: int):
    @jax.jit
    def run(order, lists, slots):
        rows = (lists * pad + slots).astype(jnp.int32)
        return jnp.zeros((n_pad,), jnp.int32).at[order].set(rows)

    return run


@functools.lru_cache(maxsize=None)
def _list_sqn_program(nlist: int, pad: int, dim: int, dtype: str):
    @jax.jit
    def run(lv):
        lv32 = lv.astype(jnp.float32)
        return jnp.sum(lv32 * lv32, axis=-1)

    return run


@functools.lru_cache(maxsize=None)
def _extract_rows_program(nlist: int, pad: int, dim: int, n: int, dtype: str):
    """Staged lists -> compact (n, D) rows + (n,) ids + (n,) assign.

    Row order is canvas order (list-major) — callers never depend on
    insertion order; merges sort by (distance, id)."""

    @jax.jit
    def run(store, list_ids):
        flat_v = store.reshape(nlist * pad, dim)
        flat_i = list_ids.reshape(nlist * pad)
        perm = jnp.argsort(flat_i < 0, stable=True).astype(jnp.int32)[:n]
        assign = (perm // pad).astype(jnp.int32)
        return flat_v[perm], flat_i[perm], assign

    return run


@register
class IVFFlatIndex:
    kind = "ivf_flat"

    def __init__(self, dim: int = DIM, nlist: int = 64, nprobe: int = 8,
                 scan_dtype: str = "float32", rerank_dtype: str = "float32",
                 pad_cap: int | None = None):
        """scan_dtype="int8" stages SQ8 inverted lists (4x less scan HBM
        traffic + the double-rate int8 MXU; shortlist + exact rerank
        restores correctness) or "bfloat16" (2x). rerank_dtype="bfloat16"
        halves the rerank store for deployments where the f32 corpus
        does not fit next to the lists (e.g. 10M x 384 on one v5e);
        recall then caps at the bf16 rounding ceiling (~0.99).

        pad_cap bounds inverted-list length: overflow rows — the
        FARTHEST from their centroid — relocate to their next-nearest
        centroid with space (the measured run10m_sq8 spill policy,
        devbuild.capped_assign). Without it a single hot cell sets the
        whole padded canvas size: a heavy-tailed 1M corpus measured 52%
        of rows in over-cap cells (BASELINE.md zipf table) and an
        uncapped canvas inflates list memory by the max/mean cell
        ratio. Spilled rows are only found when their HOST list is
        probed — the documented heavy-tail recall trade."""
        if scan_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported scan_dtype: {scan_dtype}")
        if rerank_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported rerank_dtype: {rerank_dtype}")
        if scan_dtype == "float32" and rerank_dtype == "bfloat16":
            # The f32 scan path is exact in-kernel (Precision.HIGHEST,
            # no rerank stage), so a bf16 rerank store would be dead
            # weight that never runs — reject rather than silently
            # ignore it (ADVICE round 2, #2).
            raise ValueError(
                "rerank_dtype='bfloat16' requires a quantized scan_dtype "
                "('int8' or 'bfloat16'); the float32 scan is exact and "
                "has no rerank stage"
            )
        self.dim = int(dim)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.scan_dtype = scan_dtype
        self.rerank_dtype = rerank_dtype
        if pad_cap is not None and int(pad_cap) < 8:
            raise ValueError(f"pad_cap must be >= 8, got {pad_cap}")
        self.pad_cap = int(pad_cap) if pad_cap else None
        # Host mode storage (numpy mirrors, the CLI scale).
        self._vectors = np.zeros((0, self.dim), dtype=np.float32)
        self._ids = np.zeros((0,), dtype=np.int64)
        self._assign: np.ndarray | None = None      # (ntotal,) int32
        # Device mode storage (corpus scale; see module docstring).
        self._mode = "host"
        self._dev_vecs = ChunkStore()
        self._dev_ids = ChunkStore()
        self._dev_assign = ChunkStore()
        self._n_dev = 0
        self._centroids = None                      # np or device (nlist_eff, D)
        self._staged = None
        self._cap_valid = False       # staged assignment respects pad_cap
        self._tail: GrowTail | None = None
        self._restage_needed = False
        self._ranked_cache = None
        self._geometry: dict | None = None
        from .devbuild import MaskCache

        self._mask_cache = MaskCache()

    # -- introspection ------------------------------------------------------

    @property
    def ntotal(self) -> int:
        if self._mode == "device":
            return self._n_dev
        return int(self._vectors.shape[0])

    @property
    def is_trained(self) -> bool:
        return self._centroids is not None

    def ids(self) -> np.ndarray:
        if self._mode == "device":
            if self._n_dev == 0:
                return np.zeros((0,), np.int64)
            _, ids, _ = self._rows_all()
            return np.asarray(ids).astype(np.int64)
        return self._ids.copy()

    def geometry_diagnostic(self) -> dict:
        """Clustering-geometry stats of the current staging (stages if
        needed) — devbuild.corpus_geometry; the CLI's -v reindex path
        surfaces geometry_advice from it."""
        from .devbuild import corpus_geometry

        if self.ntotal == 0 or not self.is_trained:
            return corpus_geometry(np.zeros((0,), np.int64))
        self._stage()
        return self._geometry

    # -- device retention dtype ----------------------------------------------

    @property
    def _keep_dtype(self):
        """Device-mode row retention dtype: bf16 when the rerank store is
        bf16 (the store IS the retained corpus — the 10M deployment
        shape), f32 otherwise."""
        return jnp.bfloat16 if self.rerank_dtype == "bfloat16" else jnp.float32

    def _rows_all(self):
        """Device mode: every stored row as (vecs, ids, assign) device
        arrays — from pending chunks, the staged lists, and the tail."""
        parts_v, parts_i, parts_a = [], [], []
        if self._staged is not None:
            store, list_ids, pad = self._staged[2], self._staged[3], self._staged[6]
            nlist_eff = int(self._staged[0].shape[0])
            n_staged = self._n_dev - len(self._dev_vecs) - (
                self._tail.count if self._tail else 0
            )
            if n_staged:
                v, i, a = _extract_rows_program(
                    nlist_eff, pad, self.dim, n_staged, str(store.dtype)
                )(store, list_ids)
                parts_v.append(v)
                parts_i.append(i)
                parts_a.append(a)
        if self._tail and self._tail.count:
            c = self._tail.count
            parts_v.append(self._tail["vecs"][:c])
            parts_i.append(self._tail["ids"][:c])
            parts_a.append(self._tail["assign"][:c])
        if len(self._dev_vecs):
            parts_v.append(self._dev_vecs.consolidated(self._keep_dtype))
            parts_i.append(self._dev_ids.consolidated(jnp.int32))
            parts_a.append(self._dev_assign.consolidated(jnp.int32))
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps)
        return cat(parts_v), cat(parts_i), cat(parts_a)

    # -- training / mutation --------------------------------------------------

    def train(self, data, *, iters: int = 10, seed: int = 0,
              init: str = "maximin") -> None:
        if is_device_array(data) and self.ntotal == 0:
            self._mode = "device"
        if self._mode == "device":
            data = (
                data if is_device_array(data)
                else jnp.asarray(np.ascontiguousarray(data, np.float32))
            ).astype(jnp.float32).reshape(-1, self.dim)
            nlist_eff = min(self.nlist, max(1, int(data.shape[0])))
            self._centroids = train_kmeans(
                data, nlist_eff, iters=iters, seed=seed, out_device=True,
                init=init,
            )
            if self.ntotal:
                # Retrain: pull every row back out of the staged layout,
                # re-assign on device, re-park as pending chunks.
                vecs, idsa, _ = self._rows_all()
                assign = assign_clusters(
                    vecs.astype(jnp.float32), self._centroids, out_device=True
                )
                self._dev_vecs.clear(); self._dev_ids.clear(); self._dev_assign.clear()
                self._dev_vecs.append(vecs)
                self._dev_ids.append(idsa)
                self._dev_assign.append(assign)
            self._staged = None
            self._cap_valid = False
            self._tail = None
            self._restage_needed = False
            self._ranked_cache = None
            return
        data = np.ascontiguousarray(np.asarray(data), dtype=np.float32).reshape(
            -1, self.dim
        )
        nlist_eff = min(self.nlist, max(1, data.shape[0]))
        self._centroids = train_kmeans(
            data, nlist_eff, iters=iters, seed=seed, init=init
        )
        if self.ntotal:
            self._assign = assign_clusters(self._vectors, self._centroids)
        self._staged = None
        self._cap_valid = False
        self._tail = None
        self._restage_needed = False
        self._ranked_cache = None

    def _add_device(self, vectors, ids) -> None:
        vectors = vectors.reshape(-1, self.dim)
        if not is_device_array(ids):
            ids = jnp.asarray(np.asarray(ids, np.int64).astype(np.int32))
        ids = ids.astype(jnp.int32).reshape(-1)
        if not self.is_trained:
            self.train(vectors)
        assign = assign_clusters(
            vectors.astype(jnp.float32), self._centroids, out_device=True
        )
        kept = vectors.astype(self._keep_dtype)
        if self._staged is not None:
            if self._tail is None:
                self._tail = GrowTail({
                    "vecs": (self.dim, str(jnp.dtype(self._keep_dtype))),
                    "ids": (None, "int32"),
                    "assign": (None, "int32"),
                }, initial_cap=tail_restage_threshold(self.ntotal))
            self._tail.append(vecs=kept, ids=ids, assign=assign)
            if self._tail.count > tail_restage_threshold(self.ntotal):
                self._restage_needed = True
        else:
            self._dev_vecs.append(kept)
            self._dev_ids.append(ids)
            self._dev_assign.append(assign)
        self._n_dev += int(vectors.shape[0])
        self._ranked_cache = None

    def add(self, vectors, ids) -> None:
        if is_device_array(vectors) and self._mode == "host" and self.ntotal == 0:
            self._mode = "device"
        if self._mode == "device":
            if not is_device_array(vectors):
                vectors = jnp.asarray(
                    np.ascontiguousarray(vectors, np.float32)
                )
            self._add_device(vectors, ids)
            return
        vectors = np.ascontiguousarray(
            np.asarray(vectors), dtype=np.float32
        ).reshape(-1, self.dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        if not self.is_trained:
            self.train(vectors)
        new_assign = assign_clusters(vectors, self._centroids)
        if self._staged is not None:
            # O(batch) incremental path: park the new rows in the device
            # tail instead of invalidating the whole staging (which would
            # re-upload the corpus on next search).
            if self._tail is None:
                self._tail = GrowTail({
                    "vecs": (self.dim, "float32"),
                    "ids": (None, "int32"),
                    "assign": (None, "int32"),
                }, initial_cap=tail_restage_threshold(self.ntotal))
            self._tail.append(
                vecs=jnp.asarray(vectors),
                ids=jnp.asarray(ids.astype(np.int32)),
                assign=jnp.asarray(new_assign),
            )
            if self._tail.count > tail_restage_threshold(self.ntotal):
                self._restage_needed = True
        self._vectors = np.concatenate([self._vectors, vectors], axis=0)
        self._ids = np.concatenate([self._ids, ids])
        old_assign = (
            self._assign
            if self._assign is not None
            else np.zeros((0,), np.int32)
        )
        self._assign = np.concatenate([old_assign, new_assign])
        if not np.all(self._ids[:-1] <= self._ids[1:]):
            order = np.argsort(self._ids, kind="stable")
            self._vectors = self._vectors[order]
            self._ids = self._ids[order]
            self._assign = self._assign[order]
        self._ranked_cache = None

    def reconstruct(self, doc_id: int) -> np.ndarray:
        """Return the stored vector for an external id (FAISS
        IndexIDMap2.reconstruct analog). Host mode is an O(log n)
        binary search; device mode locates the row via the staged
        layout ((n,) id pull + one-row device gather — a rare
        introspection path, not a hot one). Raises KeyError if absent.
        Device-mode bf16 retention returns the bf16-rounded row (the
        values every search scores)."""
        if self._mode == "device":
            if self._n_dev == 0:
                raise KeyError(f"id {doc_id} not in index")
            vecs, idsa, _ = self._rows_all()
            pos = np.nonzero(np.asarray(idsa) == int(doc_id))[0]
            if not len(pos):
                raise KeyError(f"id {doc_id} not in index")
            return np.asarray(vecs[int(pos[0])].astype(jnp.float32))
        pos = np.searchsorted(self._ids, int(doc_id))
        if pos >= self._ids.shape[0] or self._ids[pos] != doc_id:
            raise KeyError(f"id {doc_id} not in index")
        return self._vectors[pos].copy()

    def remove_ids(self, ids) -> int:
        """Remove stored rows by external id; returns how many were
        removed (the FAISS IndexIDMap2.remove_ids analog).

        Host mode filters the mirrors and re-stages lazily (O(n), the
        FAISS cost class). Device mode removes IN PLACE: the tail folds
        in, then one device pass turns matching list ids to -1 and their
        scan norms to +inf (the kernels' exclusion marker) — O(n) device
        work, no host traffic, no rebuild."""
        if self._mode == "device":
            from .devbuild import apply_removal, removal_table

            if self._n_dev == 0:
                return 0
            if self._staged is not None and self._tail and self._tail.count:
                self._restage_needed = True
            self._stage()  # folds chunks/tail; rows now live in the lists
            (centroids, c_sq, store, li, list_sqn, id_lookup, pad,
             scan_extra) = self._staged
            table = removal_table(ids)
            if scan_extra is not None and scan_extra[0] == "int8":
                li, removed, list_sqn, dec_sqn = apply_removal(
                    li, table, list_sqn, scan_extra[3]
                )
                scan_extra = ("int8", scan_extra[1], scan_extra[2], dec_sqn)
            else:
                li, removed, list_sqn = apply_removal(li, table, list_sqn)
            if removed:
                self._staged = (
                    centroids, c_sq, store, li, list_sqn, id_lookup, pad,
                    scan_extra,
                )
                self._n_dev -= removed
                self._ranked_cache = None
                self._mask_cache.clear()
            return removed
        ids = np.unique(np.asarray(ids, dtype=np.int64).reshape(-1))
        keep = ~np.isin(self._ids, ids)
        removed = int(self._ids.shape[0] - keep.sum())
        if removed:
            self._vectors = self._vectors[keep]
            self._ids = self._ids[keep]
            if self._assign is not None:
                self._assign = self._assign[keep]
            self._staged = None
            self._cap_valid = False
            self._tail = None
            self._restage_needed = False
            self._ranked_cache = None
            self._mask_cache.clear()
        return removed

    # -- device staging ---------------------------------------------------------

    def _stage(self):
        if self._staged is None or self._restage_needed:
            # A restage folds the tail in lazily. The FOLD path scatters
            # only the tail rows into the existing canvases with
            # fold-invariant program shapes (one compile per staging
            # epoch — a full restage recompiles its n-keyed programs
            # every time the corpus grows, 19-32 s/cycle measured at 1M
            # zipf on this remote backend); the full path rebuilds from
            # scratch (device mode reads rows back out of the old
            # staging via _rows_all first).
            if (
                self._restage_needed
                and self._staged is not None
                and self._fold_tail()
            ):
                pass
            elif self._mode == "device":
                self._stage_device()
            else:
                self._stage_host()
            self._tail = None
            self._restage_needed = False
            self._mask_cache.clear()  # masked copies derive from staged arrays
        return self._staged

    def _fold_tail(self) -> bool:
        """Incremental restage: append the tail rows at each list's
        high-water mark in the EXISTING canvases (devbuild fold
        machinery). Returns False when the fold cannot apply — pending
        pre-staging chunks, a sparse-id lookup, or a pad_cap the
        remaining capacity cannot honour — and the caller runs the full
        restage. With pad_cap, only the tail re-places
        (capped_assign_incremental): staged rows never move, so the
        placement may differ from a from-scratch capped build while
        both respect the cap exactly. Appended rows are not id-sorted
        within their lists (the Pallas position tie-break on EXACT
        distance ties may differ from a fresh build until the next full
        restage)."""
        from .devbuild import (
            _fold_rank_program, _list_hwm_program, canvas_id_lookup,
            capped_assign_incremental, corpus_geometry, fold_scatter,
            grow_pad, rows_sqn, sq8_encode_rows,
        )

        if not (self._tail and self._tail.count):
            return False
        if self._mode == "device" and len(self._dev_vecs):
            return False
        (centroids, c_sq, store, li, list_sqn, id_lookup, pad,
         scan_extra) = self._staged
        if id_lookup[0] not in ("dense", "identity"):
            return False
        nlist = int(centroids.shape[0])
        tail = self._tail
        tvecs, tids, tassign = tail["vecs"], tail["ids"], tail["assign"]
        # The ranked cache may ALIAS the staged store (a reshape view);
        # drop it before any donated scatter invalidates the buffer.
        self._ranked_cache = None
        hwm = _list_hwm_program(nlist, pad)(li)
        if self.pad_cap:
            base = np.asarray(hwm)
            if int(base.max(initial=0)) > self.pad_cap:
                return False
            try:
                tassign, _moved = capped_assign_incremental(
                    tvecs.astype(jnp.float32), centroids, base,
                    self.pad_cap, valid=tids >= 0, n_valid=tail.count,
                )
            except ValueError:
                return False
        order, lists, slots, new_hwm = _fold_rank_program(
            tail.cap, nlist
        )(tassign, tids, hwm)
        max_new = int(np.asarray(new_hwm).max(initial=1))
        if self.pad_cap and max_new > self.pad_cap:
            return False
        # Shared-store aliases must be resolved BEFORE any donated
        # scatter invalidates a buffer another staged slot references.
        shared_scan = (
            scan_extra is not None
            and scan_extra[0] == "bfloat16"
            and scan_extra[1] is store
        )
        if max_new > pad:
            pad = list_pad(max_new)
            store = grow_pad(store, pad)
            li = grow_pad(li, pad, fill=-1)
            list_sqn = grow_pad(list_sqn, pad)
            if scan_extra is not None and scan_extra[0] == "int8":
                scan_extra = (
                    "int8",
                    grow_pad(scan_extra[1], pad),
                    scan_extra[2],
                    grow_pad(scan_extra[3], pad),
                )
            elif scan_extra is not None and not shared_scan:
                scan_extra = ("bfloat16", grow_pad(scan_extra[1], pad))
        store = fold_scatter(store, tvecs, order, lists, slots)
        li = fold_scatter(li, tids, order, lists, slots)
        list_sqn = fold_scatter(
            list_sqn, rows_sqn(tvecs), order, lists, slots
        )
        if scan_extra is not None:
            if scan_extra[0] == "int8":
                codes, dec = sq8_encode_rows(tvecs, scan_extra[2])
                scan_extra = (
                    "int8",
                    fold_scatter(scan_extra[1], codes, order, lists, slots),
                    scan_extra[2],
                    fold_scatter(scan_extra[3], dec, order, lists, slots),
                )
            elif shared_scan:
                scan_extra = ("bfloat16", store)
            else:
                scan_extra = (
                    "bfloat16",
                    fold_scatter(
                        scan_extra[1], tvecs, order, lists, slots
                    ),
                )
        max_id = int(jnp.max(li))
        id_lookup = canvas_id_lookup(li, max_id)
        counts = np.asarray(jnp.sum(li >= 0, axis=1))
        self._geometry = corpus_geometry(counts, self.pad_cap)
        self._staged = (
            centroids, c_sq, store, li, list_sqn, id_lookup, pad,
            scan_extra,
        )
        self._cap_valid = bool(self.pad_cap)
        self._ranked_cache = None
        return True

    def _stage_device(self):
        """Bucket rows into padded inverted lists entirely on device —
        only the (nlist,) counts cross the host link."""
        vecs, idsa, assign = self._rows_all()
        # Rows come staged-first (then tail, then chunks): when the
        # previous staging was capped, those leading rows already hold a
        # capacity-valid assignment and only the new rows re-place.
        n_base = (
            self._n_dev
            - len(self._dev_vecs)
            - (self._tail.count if self._tail else 0)
            if self._cap_valid else 0
        )
        self._stage_from_rows(vecs, idsa, assign, n_base=n_base)
        # The bucketed store is now the storage: free the source chunks.
        self._dev_vecs.clear()
        self._dev_ids.clear()
        self._dev_assign.clear()

    def _stage_from_rows(self, vecs, idsa, assign, n_base: int = 0):
        """Device staging core shared by device mode and host mode's
        capped branch (which must not push the corpus twice).

        n_base: leading rows whose assignment is already capacity-valid
        (from the previous capped staging). The capped branch then runs
        devbuild.capped_assign_incremental over ONLY the trailing new
        rows against the remaining per-list space — a restage after a
        tail add costs one (n_new, nlist) matmul + spill over n_new
        rows instead of the full-corpus capped_assign (measured 31 s at
        1M zipf; VERDICT r4 weak #5). Already-placed rows never move,
        so the placement can differ from a from-scratch capped build —
        both respect the cap exactly."""
        from .devbuild import corpus_geometry

        nlist_eff = int(self._centroids.shape[0])
        order, lists, slots, counts = bucketize_device(assign, nlist_eff)
        self._geometry = corpus_geometry(counts, self.pad_cap)
        if self.pad_cap and int(counts.max(initial=0)) > self.pad_cap:
            from .devbuild import capped_assign, capped_assign_incremental

            assign = assign.astype(jnp.int32)
            incremental = False
            if 0 < n_base < int(assign.shape[0]):
                base_counts = np.asarray(
                    jnp.zeros((nlist_eff,), jnp.int32)
                    .at[assign[:n_base]].add(1)
                )
                if int(base_counts.max(initial=0)) <= self.pad_cap:
                    try:
                        new_assign, _moved = capped_assign_incremental(
                            vecs[n_base:], self._centroids, base_counts,
                            self.pad_cap,
                        )
                        assign = jnp.concatenate(
                            [assign[:n_base], new_assign]
                        )
                        incremental = True
                    except ValueError:
                        pass  # not enough free slots: full reassign below
            if not incremental:
                assign, _moved = capped_assign(
                    vecs, self._centroids, self.pad_cap
                )
            order, lists, slots, counts = bucketize_device(assign, nlist_eff)
        self._cap_valid = bool(self.pad_cap)
        pad = list_pad(int(counts.max(initial=1)))
        store = scatter_lists_device(vecs, order, lists, slots, nlist_eff, pad)
        li_dev = scatter_list_ids_device(idsa, order, lists, slots, nlist_eff, pad)
        c_sq = jnp.sum(
            self._centroids.astype(jnp.float32) ** 2, axis=1
        )
        list_sqn = _list_sqn_program(nlist_eff, pad, self.dim, str(store.dtype))(
            store
        )
        n = int(vecs.shape[0])
        bucket_row = _bucket_row_program(int(order.shape[0]), pad)(
            order, lists, slots
        )[:n]
        id_lookup = build_id_lookup_device(idsa, bucket_row)
        if self.scan_dtype == "float32":
            scan_extra = None
        elif self.scan_dtype == "bfloat16":
            scan_store = store if store.dtype == jnp.bfloat16 else _to_bf16(store)
            scan_extra = ("bfloat16", scan_store)
        else:
            codes, dim_scale, dec_sqn = _sq8_stage(store, li_dev)
            scan_extra = ("int8", codes, dim_scale, dec_sqn)
        self._staged = (
            self._centroids.astype(jnp.float32),
            c_sq,
            store,
            li_dev,
            list_sqn,
            id_lookup,
            pad,
            scan_extra,
        )

    def _stage_host(self):
        """Host-mode staging (the CLI scale): bucket on host, push once."""
        from .devbuild import corpus_geometry

        nlist_eff = self._centroids.shape[0]
        assign_eff = self._assign
        counts = np.bincount(assign_eff, minlength=nlist_eff)
        self._geometry = corpus_geometry(counts, self.pad_cap)
        if self.pad_cap and int(counts.max(initial=0)) > self.pad_cap:
            # Capped staging: push the corpus ONCE and run the device
            # staging core on it (capped_assign + device scatters) —
            # a numpy canvas here would cross the slow host link twice.
            # The store lands in _keep_dtype, matching device mode.
            self._stage_from_rows(
                jnp.asarray(self._vectors).astype(self._keep_dtype),
                jnp.asarray(self._ids.astype(np.int32)),
                jnp.asarray(assign_eff),
            )
            return
        pad = list_pad(int(counts.max(initial=1)))
        list_vecs = np.zeros((nlist_eff, pad, self.dim), np.float32)
        list_ids = np.full((nlist_eff, pad), -1, np.int32)
        # Vectorized bucketing: stable sort by list keeps ascending-id
        # order inside each list; slot = rank within the list.
        order = np.argsort(assign_eff, kind="stable")
        sorted_lists = assign_eff[order]
        starts = np.zeros((nlist_eff,), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        slots = np.arange(len(order)) - starts[sorted_lists]
        list_vecs[sorted_lists, slots] = self._vectors[order]
        list_ids[sorted_lists, slots] = self._ids[order]
        c_sq = np.einsum("nd,nd->n", self._centroids, self._centroids)
        list_sqn = np.einsum("lpd,lpd->lp", list_vecs, list_vecs)
        # Rerank lookup (ops/rerank.py): external id -> row in the
        # bucketed store viewed flat as (nlist*pad, D).
        from ..ops.rerank import build_id_lookup

        n = self.ntotal
        bucket_row = np.zeros((n,), np.int32)
        bucket_row[order] = (sorted_lists * pad + slots).astype(np.int32)
        # Quantized scan stores. The f32 lists cross the (slow,
        # hazard #3) host->device link exactly ONCE; every derived
        # store — bf16 scan/rerank copy, SQ8 codes — is computed on
        # device. The bucketed store doubles as the rerank candidate
        # store; with a non-f32 scan and rerank_dtype="bfloat16" the
        # single bf16 copy is shared and NO f32 copy stays on
        # device. (The CPU search path casts the store to f32 after
        # the gather, so it ranks exact distances of the same stored
        # values the TPU rerank scores.)
        li_dev = jax.device_put(list_ids)
        lv_dev = jax.device_put(list_vecs)
        if self.scan_dtype == "float32":
            store = lv_dev
            scan_extra = None
        elif self.scan_dtype == "bfloat16":
            scan_store = _to_bf16(lv_dev)
            scan_extra = ("bfloat16", scan_store)
            store = lv_dev if self.rerank_dtype == "float32" else scan_store
        else:  # int8 SQ8, symmetric per-dimension (models/flat.py)
            codes, dim_scale, dec_sqn = _sq8_stage(lv_dev, li_dev)
            scan_extra = ("int8", codes, dim_scale, dec_sqn)
            store = (
                lv_dev if self.rerank_dtype == "float32"
                else _to_bf16(lv_dev)
            )
        del lv_dev
        self._staged = (
            jax.device_put(self._centroids.astype(np.float32)),
            jax.device_put(c_sq.astype(np.float32)),
            store,
            li_dev,
            jax.device_put(list_sqn.astype(np.float32)),
            build_id_lookup(self._ids, bucket_row),
            pad,
            scan_extra,
        )

    # -- search -------------------------------------------------------------------

    def search(
        self, queries, k: int, *, nprobe: int | None = None, id_mask=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """id_mask: optional (cap,) bool keyed by EXTERNAL id — metadata
        filter pushdown (models/flat.py search docstring): masked rows
        get +inf scan norms (the kernels' exclusion marker) via a
        once-per-mask staged copy of the (n,)-sized norms operand, so
        filtered scans run at full speed. Pass the SAME mask array
        across calls to reuse the staging."""
        if is_device_array(queries):
            queries = queries.astype(jnp.float32).reshape(-1, self.dim)
        else:
            queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(
                -1, self.dim
            )
        if self.ntotal == 0 or not self.is_trained:
            shape = (queries.shape[0], k)
            return np.full(shape, np.inf, np.float32), np.full(shape, -1, np.int64)
        (
            centroids, c_sq, list_vecs, list_ids, list_sqn, id_lookup, pad,
            scan_extra,
        ) = self._stage()
        if id_mask is not None:
            from .devbuild import mask_norms, mask_rows

            def _build():
                return (
                    mask_norms(list_sqn, list_ids, id_mask),
                    None if scan_extra is None or scan_extra[0] != "int8"
                    else mask_norms(scan_extra[3], list_ids, id_mask),
                    mask_rows(list_ids, id_mask),
                )

            list_sqn, m_dec_sqn, keep_rows = self._mask_cache.get(
                id_mask, _build
            )
            if scan_extra is not None and scan_extra[0] == "int8":
                scan_extra = ("int8", scan_extra[1], scan_extra[2], m_dec_sqn)
        nlist_eff = centroids.shape[0]
        nprobe_eff = min(nprobe or self.nprobe, nlist_eff)
        if jax.default_backend() == "tpu" and scan_extra is not None:
            # Quantized scan store: approximate shortlist from the dense
            # scan (int8 runs both MXU operands int8 — double rate, 4x
            # less DMA), then an exact rerank against the bucketed store
            # restores correctness (exact f32, or the bf16 rounding
            # ceiling when rerank_dtype="bfloat16").
            from ..ops.ivf_scan_pallas import (
                ivf_full_search_program, ivf_sq8_search_program,
            )
            from ..ops.rerank import (
                exact_rerank_rows, exact_rerank_staged, shortlist_depth,
            )

            b = queries.shape[0]
            ks = min(shortlist_depth(k, self.ntotal), nprobe_eff * pad)
            if scan_extra[0] == "int8":
                _, codes, dim_scale, dec_sqn = scan_extra
                prog = ivf_sq8_search_program(
                    nlist_eff, pad, self.dim, b, nprobe_eff, ks
                )
                _, si, srows = prog(
                    centroids, c_sq, codes, dim_scale, dec_sqn, list_ids,
                    jnp.asarray(queries),
                )
                if id_mask is not None:
                    # Masked rows enter the shortlist as +inf padding
                    # with REAL ids; the rerank would re-score them
                    # finitely and leak them (devbuild.mask_shortlist_ids).
                    from .devbuild import mask_shortlist_ids

                    si = mask_shortlist_ids(si, id_mask)
                # The scan's bucket-store rows skip the id->row table
                # gather (issue-bound, as costly as the row gather
                # itself — ops/rerank.rerank_program_rows).
                dists, out_ids = exact_rerank_rows(
                    list_vecs.reshape(-1, self.dim), srows, si,
                    jnp.asarray(queries), k,
                )
            else:  # bfloat16 scan store
                # bf16 halves the list DMA, moving the dense/select
                # crossover up: measured (exp_ivf_bf16_gate.py) dense
                # 3x at width 3072, tie by ~6144.
                prog = ivf_full_search_program(
                    nlist_eff, pad, self.dim, b, nprobe_eff, ks,
                    db_dtype=jnp.bfloat16, dense=nprobe_eff * pad <= 6144,
                )
                _, si = prog(
                    centroids, c_sq, scan_extra[1], list_sqn, list_ids,
                    jnp.asarray(queries),
                )
                if id_mask is not None:
                    from .devbuild import mask_shortlist_ids

                    si = mask_shortlist_ids(si, id_mask)
                dists, out_ids = exact_rerank_staged(
                    list_vecs.reshape(-1, self.dim), id_lookup, si,
                    jnp.asarray(queries), k,
                )
        elif jax.default_backend() == "tpu":
            # Pallas scalar-prefetch scan: streams probed lists HBM->VMEM
            # at full bandwidth (XLA's probe gather runs far below it).
            # The step is DMA-bound, so exact=True scores at
            # Precision.HIGHEST for free: true-f32 distances straight from
            # the kernel (lists are stored f32) with in-kernel lowest-id
            # tie-breaks — no rerank stage, which removes its latency
            # (measured: ivf p=1 composite 131k -> ~raw-scan QPS).
            from ..ops.ivf_scan_pallas import ivf_full_search_program

            # Scan-width gate (measured at 1M x 768, pad=384): below
            # ~4096 candidates/query the dense variant (no in-kernel
            # selection, XLA lex-sort outside) is 1.4-2.9x faster
            # (p=1: 485k vs 169k QPS); above it the sort cost crosses
            # over and the in-kernel selection kernel wins (p=16: 31k
            # vs 28k). Both are bit-identical.
            dense = nprobe_eff * pad <= 4096
            program = ivf_full_search_program(
                nlist_eff, pad, self.dim, queries.shape[0], nprobe_eff, k,
                exact=True, dense=dense,
            )
            dists, out_ids = program(
                centroids, c_sq, list_vecs, list_sqn, list_ids, queries
            )
        else:
            program = _ivf_search_program(
                nlist_eff, pad, self.dim, queries.shape[0], nprobe_eff, k,
                masked=id_mask is not None,
            )
            if id_mask is not None:
                dists, out_ids = program(
                    centroids, c_sq, list_vecs, list_ids, queries, keep_rows
                )
            else:
                dists, out_ids = program(
                    centroids, c_sq, list_vecs, list_ids, queries
                )
        if self._tail and self._tail.count:
            # Incremental-add rows: exact distances, visible only to
            # queries that probe their assigned list — the same rows a
            # fresh build's scan would see — then one (distance, id)
            # lexicographic merge.
            td = tail_scores(
                self._tail, centroids, c_sq, jnp.asarray(queries), nprobe_eff
            )
            if id_mask is not None:
                from .devbuild import mask_rows as _mask_rows

                td = jnp.where(
                    _mask_rows(self._tail["ids"], id_mask)[None, :], td, jnp.inf
                )
            dists, out_ids = merge_tail(dists, out_ids, td, self._tail["ids"], k)
        return np.asarray(dists), np.asarray(out_ids, dtype=np.int64)

    def _ranked_staged(self):
        """Device-resident (vecs, ids, valid) for ranked_all, cached
        across calls and invalidated on add/train (VERDICT round 2, weak
        #3 — re-staging the corpus per call costs minutes over the slow
        host->device link at 1M x 768).

        When search staging already holds an f32 copy of every row (the
        bucketed store with rerank_dtype="float32" and an empty tail),
        that copy is REUSED flat as (nlist*pad, D) — zero extra device
        memory; row order is irrelevant because ranked_program sorts by
        (distance, id). Otherwise a dedicated pow2-padded f32 staging is
        built once."""
        if self._ranked_cache is not None:
            return self._ranked_cache
        tail_empty = not (self._tail and self._tail.count)
        if (
            self._staged is not None
            and self._staged[2].dtype == jnp.float32
            and tail_empty
            and not self._restage_needed
        ):
            store, list_ids = self._staged[2], self._staged[3]
            vecs = store.reshape(-1, self.dim)
            ids = list_ids.reshape(-1)
            self._ranked_cache = (vecs, ids, ids >= 0)
        elif self._mode == "device":
            vecs, idsa, _ = self._rows_all()
            cap = next_pow2(max(self.ntotal, 1))
            n = self.ntotal
            vecs32 = vecs.astype(jnp.float32)
            if cap != n:
                vecs32 = jnp.pad(vecs32, ((0, cap - n), (0, 0)))
                idsa = jnp.pad(idsa, (0, cap - n), constant_values=-1)
            self._ranked_cache = (vecs32, idsa, idsa >= 0)
        else:
            cap = next_pow2(max(self.ntotal, 1))
            vecs = np.zeros((cap, self.dim), np.float32)
            vecs[: self.ntotal] = self._vectors
            ids = np.full((cap,), -1, np.int32)
            ids[: self.ntotal] = self._ids.astype(np.int32)
            valid = np.zeros((cap,), bool)
            valid[: self.ntotal] = True
            self._ranked_cache = (
                jax.device_put(vecs),
                jax.device_put(ids),
                jax.device_put(valid),
            )
        return self._ranked_cache

    def ranked_all_device(self, query: np.ndarray):
        """Full exact ranking, left ON DEVICE: (dists, ids_i32, n) — the
        recall CLI streams it chunk-wise (models/flat.py docstring)."""
        query = np.ascontiguousarray(query, dtype=np.float32).reshape(self.dim)
        vecs, ids, valid = self._ranked_staged()
        dists, out_ids = ranked_program(int(vecs.shape[0]), self.dim)(
            vecs, ids, valid, jnp.asarray(query)
        )
        return dists, out_ids, self.ntotal

    def ranked_many_device(self, queries: np.ndarray):
        """Batched ranked_all_device: (dists (B, cap), ids (B, cap), n) —
        one device program per batch (models/flat.py docstring)."""
        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(
            -1, self.dim
        )
        vecs, ids, valid = self._ranked_staged()
        dists, out_ids = ranked_many_program(
            int(vecs.shape[0]), self.dim, queries.shape[0]
        )(vecs, ids, valid, jnp.asarray(queries))
        return dists, out_ids, self.ntotal

    def ranked_all(self, query: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Exact full ranking over retained raw vectors (CLI recall path)."""
        if self.ntotal == 0:
            return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
        dists, out_ids, n = self.ranked_all_device(query)
        return np.asarray(dists)[:n], np.asarray(out_ids, dtype=np.int64)[:n]

    # -- serialization ----------------------------------------------------------------

    def state(self) -> tuple[dict[str, Any], dict[str, np.ndarray]]:
        params = {"dim": self.dim, "nlist": self.nlist, "nprobe": self.nprobe,
                  "scan_dtype": self.scan_dtype,
                  "rerank_dtype": self.rerank_dtype,
                  "pad_cap": self.pad_cap}
        if self._mode == "device" and self.ntotal:
            # Serialization inherently crosses the host link — the ONE
            # place device mode pays it. bf16-retained rows widen to f32.
            vecs, idsa, assign = self._rows_all()
            arrays = {
                "vectors": np.asarray(vecs.astype(jnp.float32)),
                "ids": np.asarray(idsa).astype(np.int64),
                "centroids": np.asarray(self._centroids, dtype=np.float32),
                "assign": np.asarray(assign),
            }
            return params, arrays
        arrays = {
            "vectors": self._vectors,
            "ids": self._ids,
            "centroids": np.asarray(self._centroids, dtype=np.float32)
            if self._centroids is not None
            else np.zeros((0, self.dim), np.float32),
            "assign": self._assign if self._assign is not None else np.zeros((0,), np.int32),
        }
        return params, arrays

    @classmethod
    def from_state(cls, params: dict[str, Any], arrays: dict[str, np.ndarray]) -> "IVFFlatIndex":
        scan_dtype = str(params.get("scan_dtype", "float32"))
        rerank_dtype = str(params.get("rerank_dtype", "float32"))
        if scan_dtype == "float32":
            # Files saved before the combination guard could carry the
            # no-op f32-scan + bf16-rerank pair; coerce (the old code
            # silently ignored rerank_dtype there) rather than raise —
            # raising would make load_index_or_fresh silently discard a
            # valid index.
            rerank_dtype = "float32"
        index = cls(
            dim=int(params["dim"]), nlist=int(params["nlist"]),
            nprobe=int(params["nprobe"]),
            scan_dtype=scan_dtype, rerank_dtype=rerank_dtype,
            pad_cap=params.get("pad_cap"),
        )
        if arrays["centroids"].size:
            index._centroids = np.ascontiguousarray(arrays["centroids"], dtype=np.float32)
        if arrays["vectors"].size:
            index._vectors = np.ascontiguousarray(arrays["vectors"], dtype=np.float32)
            index._ids = np.ascontiguousarray(arrays["ids"], dtype=np.int64)
            index._assign = np.ascontiguousarray(arrays["assign"], dtype=np.int32)
        return index
