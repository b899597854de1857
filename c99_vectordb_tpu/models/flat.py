"""Flat exact index — brute-force squared-L2 over the whole database.

The TPU replacement for the reference's FAISS HNSW graph (memo_cli.py:
244-248): graph ANN is pointer-chasing and MXU-hostile, while at memo-to-
millions scale a tiled MXU matmul fused with on-chip top-k is both exact
(recall 1.0 vs HNSW's approximation) and faster per chip. Rows live in a
power-of-two padded device buffer with a validity mask so database growth
reuses cached XLA executables (no recompile per add).

Invariant: rows are kept sorted by external id (inserts are monotone in
the CLI; bulk loads are sorted on ingest), which makes `lax.top_k`'s
lowest-position tie-break equal the contract's lowest-id tie-break.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DIM
from ..ops.distances import ranked_many_program, ranked_program
from ..ops.rerank import build_id_lookup, exact_rerank_staged, shortlist_depth
from ..ops.topk import topk_program
from .base import next_pow2
from .registry import register


@register
class FlatIndex:
    kind = "flat"

    def __init__(self, dim: int = DIM, scan_dtype: str = "float32"):
        """scan_dtype="bfloat16" stages an EXTRA bf16 copy that only the
        scan kernel reads (half the HBM traffic of the HBM-bound scan,
        measured ~1.6x QPS at 1M x 768) while the f32 store still serves
        the exact rerank — results stay exact at 1.5x corpus memory.

        scan_dtype="int8" stages symmetric per-dimension SQ8 codes
        (the FAISS IndexScalarQuantizer/QT_8bit analog) instead: 4x less
        scan HBM than f32 at 1.25x total memory. The scan's per-dim
        quantization noise (sigma ~0.25 on the dot at 768-d, below the
        TPU's own bf16 multulply noise) is absorbed by the same slacked
        shortlist + exact f32 rerank, so end results stay exact."""
        if scan_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported scan_dtype '{scan_dtype}'")
        self.dim = int(dim)
        self.scan_dtype = str(scan_dtype)
        self._vectors = np.zeros((0, self.dim), dtype=np.float32)
        self._ids = np.zeros((0,), dtype=np.int64)
        self._device = None
        from .devbuild import MaskCache

        self._mask_cache = MaskCache()

    # -- introspection ----------------------------------------------------

    @property
    def ntotal(self) -> int:
        return int(self._vectors.shape[0])

    def ids(self) -> np.ndarray:
        return self._ids.copy()

    # -- mutation ----------------------------------------------------------

    @staticmethod
    def _coerce_sorted(vectors, ids, dim: int) -> tuple[np.ndarray, np.ndarray]:
        """Validate/coerce a (vectors, ids) pair and enforce the
        sorted-by-id invariant (load-bearing for lax.top_k tie-breaks).
        No copy when the inputs are already clean — from_state relies on
        this to adopt read-only mmap views without materializing them."""
        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(-1, dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        if vectors.shape[0] != ids.shape[0]:
            raise ValueError("vectors and ids must have matching leading dimension")
        if not np.all(ids[:-1] <= ids[1:]):
            order = np.argsort(ids, kind="stable")
            vectors = vectors[order]
            ids = ids[order]
        return vectors, ids

    def add(self, vectors: np.ndarray, ids: np.ndarray) -> None:
        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(-1, self.dim)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        if vectors.shape[0] != ids.shape[0]:
            raise ValueError("vectors and ids must have matching leading dimension")
        self._vectors, self._ids = self._coerce_sorted(
            np.concatenate([self._vectors, vectors], axis=0),
            np.concatenate([self._ids, ids]),
            self.dim,
        )
        self._device = None  # invalidate cached device buffers
        self._mask_cache.clear()

    def reconstruct(self, doc_id: int) -> np.ndarray:
        """Return the stored vector for an external id — the FAISS
        IndexIDMap2.reconstruct analog (the '2' in IDMap2 exists for
        exactly this reverse lookup). Raises KeyError if absent."""
        pos = np.searchsorted(self._ids, int(doc_id))
        if pos >= self._ids.shape[0] or self._ids[pos] != doc_id:
            raise KeyError(f"id {doc_id} not in index")
        return self._vectors[pos].copy()

    def remove_ids(self, ids) -> int:
        """Remove stored rows by external id; returns how many were
        removed (ids not present are ignored) — the FAISS
        IndexIDMap2.remove_ids analog (/root/reference/memo_cli.py keeps
        deletion at the record layer; the index surface offers it
        directly for library users)."""
        ids = np.unique(np.asarray(ids, dtype=np.int64).reshape(-1))
        keep = ~np.isin(self._ids, ids)
        removed = int(self._ids.shape[0] - keep.sum())
        if removed:
            self._vectors = self._vectors[keep]
            self._ids = self._ids[keep]
            self._device = None
            self._mask_cache.clear()
        return removed

    # -- device staging ----------------------------------------------------

    def _staged(self):
        """Padded device buffers, an 8-tuple:
        (vectors f32, ids_i32, valid, sq_norms, id_lookup, scan_dev,
        scan_norms, scan_scale). scan_dev is the scan_dtype copy the
        kernel reads (aliases `vectors` for f32); scan_norms is None
        when it would alias sq_norms (f32/bf16 scans) and the decoded-
        space norms for int8; scan_scale is the (D,) SQ8 per-dimension
        scale (None unless scan_dtype == "int8")."""
        if self._device is None:
            cap = next_pow2(max(self.ntotal, 1))
            vecs = np.zeros((cap, self.dim), dtype=np.float32)
            vecs[: self.ntotal] = self._vectors
            ids = np.full((cap,), -1, dtype=np.int32)
            ids[: self.ntotal] = self._ids.astype(np.int32)
            valid = np.zeros((cap,), dtype=bool)
            valid[: self.ntotal] = True
            sq_norms = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
            # +inf norms on padding rows ARE the fused kernel's mask
            # (ops/topk_pallas.fused_topk); the XLA path masks via `valid`
            # anyway, so one array serves both.
            sq_norms[self.ntotal :] = np.inf
            vecs_dev = jax.device_put(vecs)
            scan_scale = None
            if self.scan_dtype == "bfloat16":
                scan_dev = vecs_dev.astype(jnp.bfloat16)
                scan_norms = sq_norms
            elif self.scan_dtype == "int8":
                # Symmetric per-dimension SQ8: codes = round(x / a),
                # a_d = maxabs_d / 127. The scan scores DECODED space
                # (norms of x_hat; queries pre-scaled by a in search), so
                # the kernel needs no extra operand beyond the codes.
                maxabs = np.abs(vecs[: self.ntotal]).max(axis=0, initial=1e-30)
                scale = (maxabs / 127.0).astype(np.float32)  # (D,)
                codes = np.clip(np.rint(vecs / scale), -127, 127)
                scan_dev = jax.device_put(codes.astype(np.int8))
                decoded = codes * scale
                scan_norms = np.einsum("nd,nd->n", decoded, decoded).astype(
                    np.float32
                )
                scan_norms[self.ntotal:] = np.inf
                scan_scale = jax.device_put(scale)
            else:
                scan_dev = vecs_dev
                scan_norms = sq_norms
            self._device = (
                vecs_dev,
                jax.device_put(ids),
                jax.device_put(valid),
                jax.device_put(sq_norms),
                # Rerank id->row lookup (row == id-sorted position here).
                build_id_lookup(self._ids),
                scan_dev,
                jax.device_put(scan_norms) if scan_norms is not sq_norms
                else None,
                scan_scale,
            )
        return self._device

    # -- search -------------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, *, id_mask=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """id_mask: optional (cap,) bool keyed by EXTERNAL id — rows whose
        id is False (or >= cap) are excluded exactly (metadata filter
        pushdown). Mechanism: a masked copy of the (n,)-sized scan-norms
        operand (+inf = the kernels' exclusion marker), staged once per
        mask object and cached — filtered scans run at full speed with
        zero kernel changes. Pass the SAME mask array across calls to
        reuse the staging."""
        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(-1, self.dim)
        if self.ntotal == 0:
            shape = (queries.shape[0], k)
            return np.full(shape, np.inf, np.float32), np.full(shape, -1, np.int64)
        (vecs, ids, valid, sq_norms, id_lookup, scan_vecs, scan_norms,
         scan_scale) = self._staged()
        if id_mask is not None:
            from .devbuild import mask_norms, mask_rows

            def _build():
                return (
                    mask_norms(sq_norms, ids, id_mask),
                    None if scan_norms is None
                    else mask_norms(scan_norms, ids, id_mask),
                    valid & mask_rows(ids, id_mask),
                )

            sq_norms_eff, scan_norms_eff, valid_eff = self._mask_cache.get(
                id_mask, _build
            )
        else:
            sq_norms_eff, scan_norms_eff, valid_eff = sq_norms, scan_norms, valid
        k_eff = min(k, vecs.shape[0])
        on_tpu = jax.default_backend() == "tpu"
        # TPU matmuls multiply in bf16 at DEFAULT precision, so the scan's
        # ranking near the boundary carries sigma~1 distance noise; take a
        # slacked shortlist and restore exactness with an f32 rerank
        # (ops/rerank.py). CPU XLA computes true f32 — no rerank needed.
        k_scan = shortlist_depth(k_eff, vecs.shape[0]) if on_tpu else k_eff
        # The fused kernel's in-VMEM top-k is bounded by its scan tile:
        # round_up(k_scan, 128) must fit tile_n (>= 1024). Deeper
        # requests (k ~> 450) take the XLA scan + staged rerank below —
        # same guard the sharded flat route applies (parallel/sharded.py).
        fused_ok = vecs.shape[0] >= 1024 and k_scan <= 1024
        if on_tpu and fused_ok:
            # Fused Pallas kernel: streams DB tiles HBM->VMEM with the
            # running top-k on chip; the padded pow2 capacity >= 1024 is
            # always a tile multiple. (Smaller DBs: one XLA matmul wins.)
            # The scan reads the scan_dtype copy; the rerank below always
            # reads f32, so bf16/int8 scanning stays exact end-to-end.
            from ..ops.topk_pallas import fused_topk

            q_scan = jnp.asarray(queries)
            if scan_scale is not None:  # SQ8: fold the per-dim scale in
                q_scan = q_scan * scan_scale
            dists, out_ids, scan_rows = fused_topk(
                scan_vecs, ids,
                sq_norms_eff if scan_norms_eff is None else scan_norms_eff,
                q_scan, k_scan, return_rows=True,
            )
            if id_mask is not None:
                # Masked rows can pad the shortlist as +inf entries with
                # REAL ids; the rerank would re-score them finitely and
                # leak them (devbuild.mask_shortlist_ids).
                from .devbuild import mask_shortlist_ids

                out_ids = mask_shortlist_ids(out_ids, id_mask)
        else:
            dists, out_ids = topk_program(vecs.shape[0], self.dim, k_scan)(
                vecs, ids, valid_eff, sq_norms_eff, queries
            )
            scan_rows = None
        if on_tpu:
            if scan_rows is not None:
                # The scan store shares row order with the f32 store, so
                # the kernel's winner rows index the rerank store
                # directly — no id->row table gather (issue-bound,
                # ~13 ns/element; ops/rerank.rerank_program_rows).
                from ..ops.rerank import exact_rerank_rows

                dists, out_ids = exact_rerank_rows(
                    vecs, scan_rows, out_ids, queries, k_eff
                )
            else:
                dists, out_ids = exact_rerank_staged(
                    vecs, id_lookup, out_ids, queries, k_eff
                )
        dists = np.asarray(dists)
        out_ids = np.asarray(out_ids, dtype=np.int64)
        if k_eff < k:
            pad = ((0, 0), (0, k - k_eff))
            dists = np.pad(dists, pad, constant_values=np.inf)
            out_ids = np.pad(out_ids, pad, constant_values=-1)
        return dists, out_ids

    def ranked_all_device(self, query: np.ndarray):
        """Full exact ranking, left ON DEVICE: (dists, ids_i32, n).

        The recall CLI streams this in O(k)-sized chunks instead of
        pulling the whole n-length ranking through the 1-30 MB/s host
        link (VERDICT r3 next #5); ranked_all is the full-pull wrapper."""
        query = np.ascontiguousarray(query, dtype=np.float32).reshape(self.dim)
        vecs, ids, valid = self._staged()[:3]
        dists, out_ids = ranked_program(vecs.shape[0], self.dim)(vecs, ids, valid, query)
        return dists, out_ids, self.ntotal

    def ranked_many_device(self, queries: np.ndarray):
        """Batched ranked_all_device: (dists (B, cap), ids (B, cap), n).

        One device program for the whole batch — the serve REPL's --batch
        mode amortizes the per-program dispatch round-trip (~90 ms on the
        TPU relay) across queries; each row matches the single-query
        program's output for that query (ops/distances.ranked_many_program)."""
        queries = np.ascontiguousarray(queries, dtype=np.float32).reshape(
            -1, self.dim
        )
        vecs, ids, valid = self._staged()[:3]
        dists, out_ids = ranked_many_program(
            vecs.shape[0], self.dim, queries.shape[0]
        )(vecs, ids, valid, jnp.asarray(queries))
        return dists, out_ids, self.ntotal

    def ranked_all(self, query: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if self.ntotal == 0:
            return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
        dists, out_ids, n = self.ranked_all_device(query)
        return np.asarray(dists)[:n], np.asarray(out_ids, dtype=np.int64)[:n]

    # -- serialization -------------------------------------------------------

    def state(self) -> tuple[dict[str, Any], dict[str, np.ndarray]]:
        params = {"dim": self.dim, "scan_dtype": self.scan_dtype}
        arrays = {"vectors": self._vectors, "ids": self._ids}
        return params, arrays

    @classmethod
    def from_state(cls, params: dict[str, Any], arrays: dict[str, np.ndarray]) -> "FlatIndex":
        index = cls(
            dim=int(params["dim"]),
            scan_dtype=str(params.get("scan_dtype", "float32")),
        )
        if arrays["vectors"].size:
            # Adopt the state arrays without copying (they may be read-only
            # mmap views — storage/index_io.py): add()'s concatenate would
            # eagerly materialize the whole store before the device push.
            index._vectors, index._ids = cls._coerce_sorted(
                arrays["vectors"], arrays["ids"], index.dim
            )
        return index
