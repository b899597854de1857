"""Fused squared-L2 score + top-k selection Pallas TPU kernel.

The hot search kernel (SURVEY.md §7 step 3): for each database tile, one
MXU matmul produces a (B_tile, N_tile) score block in VMEM and the running
per-query top-k is updated in place — the full (B, N) score matrix never
exists in HBM. For a 1M x 768 database that avoids writing/re-reading
~0.5 GB of scores per 128-query batch; HBM traffic is one streaming pass
over the database plus a (B, k) result.

Layout:
  grid = (B/TB, N/TN); the N axis is sequential ("arbitrary") so VMEM
  scratch (best distances + ids per query) carries across database tiles;
  the B axis is parallel. Tile j of the database is DMA'd HBM->VMEM by the
  pallas pipeline (auto double-buffered).

Selection: per tile the scratch (TB, K) is concatenated with the tile's
(TB, TN) scores and the k smallest are re-extracted by k rounds of
argmin+mask — k*(K+TN) VPU work, negligible next to the TB*TN*D MXU work.
Tie-breaking matches the contract (lowest id on equal distance): argmin
takes the first minimum, scratch entries (earlier tiles = lower ids) sit
before tile entries, and tile rows are stored in ascending-id order.

Exactness: validated against the XLA reference path (ops/topk.py) and a
NumPy oracle in tests/test_topk_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _fused_kernel(q_ref, db_ref, norms_ref, *rest, k: int, k_pad: int,
                  tile_b: int, n_steps: int, sel_mode: str = "adaptive",
                  int8_q: bool = False):
    if int8_q:
        qscale_ref, out_d_ref, out_i_ref, best_d, best_i = rest
    else:
        out_d_ref, out_i_ref, best_d, best_i = rest
    n_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    row0 = pl.multiple_of(b_idx * tile_b, 8)

    @pl.when(n_idx == 0)
    def _init():
        best_d[pl.ds(row0, tile_b), :] = jnp.full((tile_b, k_pad), jnp.inf, jnp.float32)
        best_i[pl.ds(row0, tile_b), :] = jnp.full(
            (tile_b, k_pad), jnp.iinfo(jnp.int32).max, jnp.int32
        )

    q = q_ref[pl.ds(row0, tile_b), :]  # (TB, D) slice of the resident batch
    x = db_ref[:]                      # (TN, D); bf16/int8 storage cuts HBM
    if int8_q:
        # int8 x int8 -> int32 runs the MXU's double-rate int8 path
        # (measured v5e: 349 TFLOP/s vs 167 bf16 at the production tile).
        # The caller quantized the staged queries per ROW (scale in
        # qscale_ref), so the epilogue rescales with one (TB, 1) fma.
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rs = qscale_ref[pl.ds(row0, tile_b), :]          # (TB, 1) f32
        dist = ip.astype(jnp.float32) * rs + norms_ref[:]
    else:
        if x.dtype == jnp.int8:
            # SQ8 codes with full-precision queries: decode to bf16 for
            # the MXU (the caller folded the per-dimension scale into
            # the staged queries; one VPU cast pass per tile).
            x = x.astype(jnp.bfloat16)
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # (TB, TN) on the MXU, f32 accumulate
        # Selection key: ||x||^2 - 2 q.x, with the -2 pre-folded into the
        # staged queries by the caller (lossless power-of-2 scale) so the
        # epilogue is ONE add, not mul+sub. The per-query constant ||q||^2
        # and the max(., 0) clamp are ORDER-PRESERVING, so the caller
        # applies both once on the (B, k) output instead of per tile: the
        # VPU epilogue here serializes with the MXU matmul (no cross-step
        # software pipelining in the kernel body), so every elementwise
        # pass over the (TB, TN) block costs large-batch throughput
        # directly. Padding rows need NO mask pass either — the caller
        # stages their sq_norms as +inf, which makes this very add
        # produce +inf for them.
        dist = norms_ref[:] + ip

    # Adaptive two-speed selection. The scratch top-k is kept SORTED
    # ascending, so each improving candidate is one roll-shift insertion,
    # and the number of extraction rounds equals the tile's improving-
    # candidate count (maxed over the query rows, capped at k — extraction
    # is in ascending distance order, so k rounds always suffice).
    #
    # Round cost is the kernel's critical path at large resident batches
    # (the scan floor itself hides under the MXU — measured 8.9 ms/batch
    # at B=1024, exactly the matmul roofline), so rounds run NARROW: the
    # tile is pre-reduced to a 128-lane slate (per-lane group-min), and
    # extraction scans 128 lanes instead of tile_n columns. The slate
    # drops a candidate only if two improving candidates share a lane;
    # that is exactly detectable from per-lane improving counts, and such
    # tiles (always the first few, rarely any other) take the wide
    # full-width path instead — results stay exact.
    #
    # The kernel selects POSITIONS (db row indices), not ids: positions
    # are pure arithmetic on (step, group, lane) — id data inside the
    # kernel would need (1, LANE)->(TB, LANE) sublane broadcasts, which
    # Mosaic cannot lower — and the caller translates the (B, k) winners
    # with one tiny XLA gather. Rows are stored ascending by id, so
    # lowest-position tie-breaks equal the contract's lowest-id order.
    tb, tn = dist.shape
    groups = tn // LANE
    out_col = jax.lax.broadcasted_iota(jnp.int32, (tb, k_pad), 1)
    int_max = jnp.iinfo(jnp.int32).max
    pos0 = n_idx * tn                                            # tile base row

    worst = best_d[pl.ds(row0, tile_b), k - 1][:, None]          # (TB, 1) kth best
    # Slate build: per-lane min over the lane-aligned column groups
    # (columns g*128+lane share a lane across vector registers, so the
    # static slices below are relayout-free — a (tb, G, 128) reshape is
    # NOT: it moves the group axis onto sublanes). Strict < with g
    # ascending keeps the lowest position on in-lane ties.
    slate_d = dist[:, 0:LANE]
    slate_g = jnp.zeros((tb, LANE), jnp.int32)   # winning group per lane
    lane_cnt = (slate_d < worst).astype(jnp.int32)
    for g in range(1, groups):
        dg = dist[:, g * LANE:(g + 1) * LANE]
        upd = dg < slate_d
        slate_d = jnp.where(upd, dg, slate_d)
        slate_g = jnp.where(upd, g, slate_g)
        lane_cnt = lane_cnt + (dg < worst).astype(jnp.int32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, LANE), 1)
    slate_i = pos0 + slate_g * LANE + lane_iota                  # positions
    counts = jnp.sum(lane_cnt, axis=1)                           # (TB,)
    rounds = jnp.minimum(jnp.max(counts), k)                     # scalar, traced
    collide = jnp.max(lane_cnt) >= 2                             # slate lossy?
    if sel_mode == "none":      # diagnostic: scan-only floor (WRONG results)
        rounds = jnp.minimum(rounds, 0)
    elif sel_mode == "full":    # diagnostic: k wide rounds, no adaptivity
        rounds = jnp.full((), k, jnp.int32)
        collide = rounds > 0
    rounds_wide = jnp.where(collide, rounds, 0)
    rounds_narrow = jnp.where(collide, 0, rounds)

    def insert(m, vid):
        # -- insert (m, vid) into the sorted scratch via a shift; inserts
        # past position k fall into the >=k waste lanes and are sliced off.
        bd = best_d[pl.ds(row0, tile_b), :]
        bi = best_i[pl.ds(row0, tile_b), :]
        pos = jnp.sum((bd <= m).astype(jnp.int32), axis=1, keepdims=True)
        before = out_col < pos
        at = out_col == pos
        shifted_d = pltpu.roll(bd, 1, axis=1)
        shifted_i = pltpu.roll(bi, 1, axis=1)
        best_d[pl.ds(row0, tile_b), :] = jnp.where(
            before, bd, jnp.where(at, m, shifted_d)
        )
        best_i[pl.ds(row0, tile_b), :] = jnp.where(
            before, bi, jnp.where(at, vid, shifted_i)
        )

    # Two unconditional loops with complementary trip counts (a 0-trip
    # fori_loop is ~free; pl.when around traced-bound loops is what the
    # Mosaic compiler chokes on). Exactly one of them runs per tile.
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, tn), 1)

    def wide_round(_, remaining):
        # extract the tile minimum (first column = lowest position)
        m = jnp.min(remaining, axis=1, keepdims=True)            # (TB, 1)
        first = jnp.min(
            jnp.where(remaining == m, col, tn), axis=1, keepdims=True
        )
        hit = col == first
        insert(m, pos0 + first)
        return jnp.where(hit, jnp.inf, remaining)

    jax.lax.fori_loop(0, rounds_wide, wide_round, dist)

    def narrow_round(_, carry):
        rem_d, rem_i = carry
        m = jnp.min(rem_d, axis=1, keepdims=True)                # (TB, 1)
        # lowest id among lanes at the minimum (exact tie-break)
        vid = jnp.min(
            jnp.where(rem_d == m, rem_i, int_max), axis=1, keepdims=True
        )
        hit = (rem_d == m) & (rem_i == vid)
        insert(m, vid)
        return jnp.where(hit, jnp.inf, rem_d), rem_i

    jax.lax.fori_loop(0, rounds_narrow, narrow_round, (slate_d, slate_i))

    # The output block has a constant index map (written back to HBM once,
    # at grid end); copying scratch->out on every db tile is pure waste, so
    # only the final pass over the corpus publishes the result.
    @pl.when(n_idx == n_steps - 1)
    def _publish():
        out_d_ref[pl.ds(row0, tile_b), :] = best_d[pl.ds(row0, tile_b), :]
        out_i_ref[pl.ds(row0, tile_b), :] = best_i[pl.ds(row0, tile_b), :]


@functools.lru_cache(maxsize=None)
def _fused_call(n: int, dim: int, b: int, k: int, k_pad: int, tile_b: int,
                tile_n: int, db_dtype=jnp.float32, sel_mode: str = "adaptive",
                int8_q: bool = False):
    # Grid order: database tiles OUTER, query tiles INNER, with the whole
    # query batch + top-k scratch VMEM-resident. Consecutive inner steps
    # reuse the same db block (pallas skips the refetch), so ONE streaming
    # pass over the corpus serves the entire batch — HBM traffic is
    # n*dim*itemsize + b*dim*4, independent of b/tile_b.
    grid = (n // tile_n, b // tile_b)
    kernel = functools.partial(
        _fused_kernel, k=k, k_pad=k_pad, tile_b=tile_b, n_steps=grid[0],
        sel_mode=sel_mode, int8_q=int8_q,
    )
    # Off-TPU (CPU CI) the Mosaic kernel runs in interpreter mode.
    interpret = jax.default_backend() != "tpu"
    in_specs = [
        pl.BlockSpec((b, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    if int8_q:  # per-row quantization scales of the staged queries
        in_specs.append(
            pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k_pad), jnp.float32),
            pltpu.VMEM((b, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dim,
            bytes_accessed=n * (dim * jnp.dtype(db_dtype).itemsize + 4)
            + b * dim * jnp.dtype(db_dtype).itemsize
            + b * k_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def fused_topk(
    db: jax.Array,
    ids: jax.Array,
    sq_norms: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    tile_b: int = 256,  # best at B>=256 (rounds are maxed over a row
    # tile, so bigger tiles pay more selection); clamps to the batch.
    tile_n: int | None = None,  # auto: 2048 for bf16 stores (fits VMEM,
    # fewer steps — measured best at both B=128 and B=1024), 1024 f32.
    max_resident_b: int = 1024,
    _sel_mode: str = "adaptive",  # perf diagnostics only ("none"/"full")
    q_int8: bool | None = None,  # int8 stores: quantize queries per row
    # and run the MXU's double-rate int8 path (None = auto/on for int8
    # stores; False forces the bf16-decode scan for A/B comparison)
    return_rows: bool = False,  # also return each winner's db ROW, so a
    # downstream rerank against a same-order store can gather directly
    # (ops/rerank.rerank_program_rows) instead of paying the
    # issue-bound id->row table lookup
) -> tuple[jax.Array, ...]:
    """Exact batched top-k via the fused kernel.

    db: (N, D) float32/bf16 rows ascending by id; ids: (N,) int32 with -1
    for padding rows; sq_norms: (N,) float32 per-row ||x||^2 with +INF on
    padding rows (that is the padding mask — the kernel adds no mask pass
    of its own); queries: (B, D). Returns ascending (distances (B, k),
    ids (B, k)); empty slots (inf, -1); with return_rows=True a third
    (B, k) int32 array of db row indices (clamped; meaningless where
    id == -1). N must be a multiple of tile_n (callers pad). The whole
    batch stays VMEM-resident so one corpus scan serves all queries;
    batches beyond max_resident_b are processed in resident-size chunks.
    """
    n, dim = db.shape
    b = queries.shape[0]
    if tile_n is None:
        narrow_store = db.dtype in (jnp.bfloat16, jnp.int8)
        tile_n = 2048 if narrow_store and n % 2048 == 0 else 1024
    if n % tile_n != 0:
        raise ValueError(f"db rows ({n}) must be a multiple of tile_n ({tile_n})")
    k_pad = _round_up(max(k, 1), LANE)
    if k_pad > tile_n:
        raise ValueError(f"k ({k}) too large for tile_n ({tile_n})")

    if b > max_resident_b:
        parts = [
            fused_topk(
                db, ids, sq_norms, queries[s0 : s0 + max_resident_b], k,
                tile_b=tile_b, tile_n=tile_n, max_resident_b=max_resident_b,
                q_int8=q_int8, return_rows=return_rows,
            )
            for s0 in range(0, b, max_resident_b)
        ]
        return tuple(
            jnp.concatenate([p[j] for p in parts], axis=0)
            for j in range(len(parts[0]))
        )

    tb = min(tile_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))

    # Stage queries pre-scaled by -2 (lossless exponent shift) and in the
    # db dtype, so the kernel's epilogue is a single add and the MXU runs
    # with both operands in the storage dtype (2x rate for bf16). For
    # int8 stores the staged queries are additionally quantized per ROW
    # (symmetric, scale passed to the kernel) so both operands are int8
    # and the MXU runs its double-rate int8 path; the rerank stage
    # absorbs the quantization noise exactly like bf16-multiply noise.
    # The caller is responsible for folding the SQ8 per-dimension scale
    # into `queries` and passing decoded-space sq_norms.
    int8_q = db.dtype == jnp.int8 and (q_int8 is None or bool(q_int8))
    if int8_q:
        q_m2 = queries.astype(jnp.float32) * -2.0
        rs = (
            jnp.maximum(jnp.max(jnp.abs(q_m2), axis=1, keepdims=True), 1e-30)
            / 127.0
        )
        q_staged = jnp.clip(jnp.rint(q_m2 / rs), -127, 127).astype(jnp.int8)
        extra = (rs,)
    else:
        q_dtype = jnp.bfloat16 if db.dtype == jnp.int8 else db.dtype
        q_staged = (queries.astype(jnp.float32) * -2.0).astype(q_dtype)
        extra = ()
    out_d, out_pos = _fused_call(n, dim, b_pad, k, k_pad, tb, tile_n, db.dtype,
                                 _sel_mode, int8_q)(
        q_staged,
        db,
        sq_norms.reshape(1, n),
        *extra,
    )
    out_d = out_d[:b, :k]
    out_pos = out_pos[:b, :k]
    # The kernel selects on ||x||^2 - 2 q.x; restore true squared-L2 here
    # (add ||q||^2, clamp cancellation) — order-preserving, so doing it
    # once on (B, k) instead of per tile removes serial VPU passes.
    q_sq = jnp.sum(
        queries[:b].astype(jnp.float32) * queries[:b].astype(jnp.float32),
        axis=1, keepdims=True,
    )
    out_d = jnp.maximum(out_d + q_sq, 0.0)
    # Translate winning POSITIONS to external ids: one (B, k) XLA gather.
    # Unfilled slots carry int32-max positions and +inf distances; db
    # padding rows carry -1 in `ids`, so both map to -1 below.
    rows = jnp.clip(out_pos, 0, n - 1)
    out_i = jnp.where(
        jnp.isinf(out_d), -1, ids.astype(jnp.int32)[rows]
    )
    if return_rows:
        return out_d, out_i, rows
    return out_d, out_i


def fused_topk_numpy(
    db: np.ndarray, ids: np.ndarray, queries: np.ndarray, k: int, **kw
) -> tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: pad + stage numpy inputs and run the kernel."""
    n, dim = db.shape
    tile_n = kw.pop("tile_n", 1024)
    n_pad = _round_up(max(n, tile_n), tile_n)
    db_p = np.zeros((n_pad, dim), np.float32)
    db_p[:n] = db
    ids_p = np.full((n_pad,), -1, np.int32)
    ids_p[:n] = ids
    sq = np.einsum("nd,nd->n", db_p, db_p).astype(np.float32)
    sq[n:] = np.inf  # +inf norms ARE the padding mask (see fused_topk)
    d, i = fused_topk(
        jnp.asarray(db_p), jnp.asarray(ids_p), jnp.asarray(sq),
        jnp.asarray(queries, dtype=jnp.float32), k, tile_n=tile_n, **kw
    )
    return np.asarray(d), np.asarray(i, dtype=np.int64)
