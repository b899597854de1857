"""Pallas IVF list-scan kernel — gather-free probing via scalar-prefetch DMA.

XLA lowers the IVF probe gather (`list_vecs[lists]`, a (B, pad, D) row
gather per probe) to a generic gather that runs far below HBM bandwidth
on TPU. This kernel replaces it with the idiomatic Mosaic pattern: the
probed list ids are SCALAR-PREFETCHED, and each grid step's BlockSpec
index_map uses them to DMA exactly the needed (pad, D) list block from
HBM into VMEM — a plain streaming copy at full bandwidth.

Grid: (B, nprobe); the probe axis is sequential so per-query top-k state
carries in VMEM scratch (re-initialized at p == 0), updated with the same
adaptive sorted-insertion used by the flat kernel (ops/topk_pallas.py).
Per step: one (1, D) x (D, pad) MXU matvec + masked distance + 0..k
insertion rounds. HBM traffic is the theoretical minimum
B * nprobe * pad * D * itemsize.

Mosaic block-shape constraints shape the layouts: the last two block dims
must be (8k, 128k)-divisible or equal to the array dims, so queries ride
as one full (B, D) VMEM block (row-read dynamically), per-list norms/ids
are stored (nlist, 1, pad), and outputs are (B, 1, k_pad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import merge_topk

LANE = 128


def _use_approx_select() -> bool:
    """Shortlist-selection policy knob: approx_min_k on TPU unless
    C99VDB_EXACT_SHORTLIST=1 forces exact top_k (the escape hatch for
    corpora where the probabilistic shortlist's measured-1.0000
    completeness might not transfer; see _shortlist_topk)."""
    import os

    if os.environ.get("C99VDB_EXACT_SHORTLIST", "").strip() in ("1", "true"):
        return False
    return jax.default_backend() == "tpu"


def _shortlist_topk(d2, i2, ks: int):
    """Approximate-key shortlist selection: top-k by key only (key ties
    break by scan position, not id — downstream exact reranks are
    id-aware). On TPU this uses approx_min_k (the PartialReduce op):
    measured 3.2-5.7x cheaper than lax.top_k at shortlist widths with
    1.000 selected-set overlap (benchmarks/exp_approx_topk.py) — and a
    shortlist feeding an exact rerank needs the SET, not exact order.

    Honesty note: approx_min_k makes shortlist COMPLETENESS
    probabilistic (recall_target=0.999 per element). The exact rerank
    restores true-f32 order of whatever was selected but cannot recover
    a dropped true neighbor; strict recall 1.0000 / the 0.9930 10M
    ceiling are MEASURED results at the product shapes (BASELINE.md
    calibration table), not a worst-case guarantee. Set
    C99VDB_EXACT_SHORTLIST=1 to force exact selection.

    Pads to width ks with (inf, -1) when the scan width is narrower
    than the requested shortlist (ADVICE round 2, #1 — lax.top_k would
    raise instead).

    Returns (keys, ids, pos) — pos is each entry's CANVAS position
    (column of d2), which _canvas_rows turns into the bucket-store row
    so the downstream rerank can gather rows WITHOUT an id->row table
    lookup (the table gather is issue-bound at ~13 ns/element — as
    expensive as gathering the candidate rows themselves; see
    ops/rerank.rerank_program_rows). Padded entries carry pos 0 and
    id -1 (the rerank masks on id < 0)."""
    width = d2.shape[1]
    k_eff = min(ks, width)
    # approx only when the shortlist is a SMALL fraction of the scan
    # width: at k ~ width/2 the PartialReduce degenerates (measured
    # +535us/batch selecting 200 of 384 vs ~65us exact — the 3-6x wins
    # hold for k <= width/4; benchmarks/exp_pq_stages.py).
    if _use_approx_select() and 4 * k_eff <= width:
        d, pos = jax.lax.approx_min_k(d2, k_eff, recall_target=0.999)
    else:
        neg, pos = jax.lax.top_k(-d2, k_eff)
        d = -neg
    i = jnp.take_along_axis(i2, pos, axis=1)
    if ks > width:
        padcfg = ((0, 0), (0, ks - width))
        d = jnp.pad(d, padcfg, constant_values=jnp.inf)
        i = jnp.pad(i, padcfg, constant_values=-1)
        pos = jnp.pad(pos, padcfg, constant_values=0)
    return d, i, pos


def _canvas_rows(pos, probes, pad: int):
    """Bucket-store row (list * pad + slot) of each shortlist canvas
    position. The probed-list id is selected with nprobe vectorized
    compares — an axis-0 gather of probes would pay the same ~13
    ns/element issue cost the whole scheme exists to avoid."""
    p_idx = (pos // pad).astype(jnp.int32)
    slot = (pos % pad).astype(jnp.int32)
    lsel = jnp.zeros(pos.shape, jnp.int32)
    for p in range(probes.shape[1]):
        lsel = jnp.where(p_idx == p, probes[:, p : p + 1], lsel)
    return lsel * pad + slot


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _ivf_scan_kernel(
    lists_ref,      # scalar-prefetch: (B, nprobe) int32 probed list ids
    q_ref,          # (B, D) all queries, VMEM-resident
    vecs_ref,       # (1, pad, D) the probed list's vectors (DMA'd by index_map)
    sqn_ref,        # (1, 1, pad) the list's row norms
    ids_ref,        # (1, 1, pad) the list's external ids (-1 padding)
    out_d_ref,      # (1, 1, k_pad)
    out_i_ref,      # (1, 1, k_pad)
    best_d,         # scratch (1, k_pad)
    best_i,         # scratch (1, k_pad)
    *,
    k: int,
    k_pad: int,
    exact: bool,
):
    q_idx = pl.program_id(0)
    p_idx = pl.program_id(1)

    @pl.when(p_idx == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d[:], jnp.inf)
        best_i[:] = jnp.full_like(best_i[:], jnp.iinfo(jnp.int32).max)

    q = q_ref[pl.ds(q_idx, 1), :]                  # (1, D)
    x = vecs_ref[0]                                # (pad, D)
    # The step is DMA-bound (the (pad, D) list copy dwarfs the (1, D) x
    # (D, pad) matvec), so exact=True scores at Precision.HIGHEST — true
    # f32 products — for FREE, which removes the need for any downstream
    # rerank when the lists are stored f32.
    ip = jax.lax.dot_general(
        q.astype(x.dtype), x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )                                              # (1, pad)
    qf = q.astype(jnp.float32)
    dist = jnp.sum(qf * qf) + sqn_ref[0] - 2.0 * ip
    dist = jnp.maximum(dist, 0.0)
    ids = ids_ref[0]                               # (1, pad)
    dist = jnp.where(ids >= 0, dist, jnp.inf)
    # Padding slots take the SENTINEL id (int32 max, like empty top-k
    # entries), so the boundary-tie test below can never count them as
    # improving while the top-k is underfilled (worst == inf).
    ids = jnp.where(ids >= 0, ids, jnp.iinfo(jnp.int32).max)

    pad = dist.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pad), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    worst = best_d[0, k - 1]
    worst_i = best_i[0, k - 1]
    # A candidate improves the top-k if it strictly beats the k-th best
    # OR ties it with a LOWER id (the k-th boundary obeys the same
    # lowest-id tie rule as every other position — strict < alone would
    # silently drop an equal-distance lower-id candidate and diverge
    # from the dense lex-sort / XLA merge on exact ties). Extraction
    # picks minima by (dist, POSITION), which equals (dist, id) order
    # because staging stores each list's slots ascending by id
    # (models/ivf_flat.py:_stage) — that invariant is REQUIRED here.
    improving = (dist < worst) | ((dist == worst) & (ids < worst_i))
    rounds = jnp.minimum(jnp.sum(improving.astype(jnp.int32)), k)

    def extract_and_insert(_, remaining):
        m = jnp.min(remaining, axis=1, keepdims=True)            # (1, 1)
        first = jnp.min(jnp.where(remaining == m, col, pad), axis=1, keepdims=True)
        hit = col == first
        vid = jnp.sum(jnp.where(hit, ids, 0), axis=1, keepdims=True)

        bd = best_d[:]
        bi = best_i[:]
        # Insertion point: after strictly-better entries and after equal-
        # distance entries with a SMALLER id — candidates from different
        # probes then tie-break by lowest id exactly like the XLA merge
        # (ADVICE round 1, #2), including at the k-th boundary.
        pos = jnp.sum(
            ((bd < m) | ((bd == m) & (bi < vid))).astype(jnp.int32),
            axis=1, keepdims=True,
        )
        before = out_col < pos
        at = out_col == pos
        best_d[:] = jnp.where(before, bd, jnp.where(at, m, pltpu.roll(bd, 1, axis=1)))
        best_i[:] = jnp.where(before, bi, jnp.where(at, vid, pltpu.roll(bi, 1, axis=1)))
        return jnp.where(hit, jnp.inf, remaining)

    jax.lax.fori_loop(0, rounds, extract_and_insert, dist)

    out_d_ref[0] = best_d[:]
    out_i_ref[0] = best_i[:]


def _ivf_scan_kernel_multi(
    lists_ref,      # scalar-prefetch: (B, nprobe) int32 probed list ids
    q_ref,          # (B, D) all queries, VMEM-resident
    *refs,          # QPS x (vecs, sqn, ids) blocks, then outs, then scratch
    k: int,
    k_pad: int,
    exact: bool,
    qps_step: int,  # queries per grid step
):
    """Multi-query variant: each grid step DMAs the probed lists of
    `qps_step` consecutive queries (one scalar-prefetched BlockSpec per
    query slot), amortizing the fixed per-step cost — the single-query
    kernel measured ~5.9us/step against a ~1.7us list-DMA floor."""
    vecs_refs = refs[0::3][:qps_step]
    sqn_refs = refs[1::3][:qps_step]
    ids_refs = refs[2::3][:qps_step]
    out_d_ref, out_i_ref, best_d, best_i = refs[3 * qps_step:]

    g_idx = pl.program_id(0)
    p_idx = pl.program_id(1)

    @pl.when(p_idx == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d[:], jnp.inf)
        best_i[:] = jnp.full_like(best_i[:], jnp.iinfo(jnp.int32).max)

    k_col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    for j in range(qps_step):
        q = q_ref[pl.ds(g_idx * qps_step + j, 1), :]       # (1, D)
        x = vecs_refs[j][0]                                # (pad, D)
        ip = jax.lax.dot_general(
            q.astype(x.dtype), x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if exact else None,
        )
        qf = q.astype(jnp.float32)
        dist = jnp.sum(qf * qf) + sqn_refs[j][0] - 2.0 * ip
        dist = jnp.maximum(dist, 0.0)
        ids = ids_refs[j][0]                               # (1, pad)
        dist = jnp.where(ids >= 0, dist, jnp.inf)
        # padding -> sentinel id; see _ivf_scan_kernel
        ids = jnp.where(ids >= 0, ids, jnp.iinfo(jnp.int32).max)

        pad = dist.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, pad), 1)
        worst = best_d[j, k - 1]
        worst_i = best_i[j, k - 1]
        # boundary ties with a lower id improve too (see _ivf_scan_kernel)
        improving = (dist < worst) | ((dist == worst) & (ids < worst_i))
        rounds = jnp.minimum(jnp.sum(improving.astype(jnp.int32)), k)

        def extract_and_insert(_, remaining, j=j, ids=ids, col=col, pad=pad):
            m = jnp.min(remaining, axis=1, keepdims=True)
            first = jnp.min(
                jnp.where(remaining == m, col, pad), axis=1, keepdims=True
            )
            hit = col == first
            vid = jnp.sum(jnp.where(hit, ids, 0), axis=1, keepdims=True)
            bd = best_d[pl.ds(j, 1), :]
            bi = best_i[pl.ds(j, 1), :]
            pos = jnp.sum(
                ((bd < m) | ((bd == m) & (bi < vid))).astype(jnp.int32),
                axis=1, keepdims=True,
            )
            before = k_col < pos
            at = k_col == pos
            best_d[pl.ds(j, 1), :] = jnp.where(
                before, bd, jnp.where(at, m, pltpu.roll(bd, 1, axis=1))
            )
            best_i[pl.ds(j, 1), :] = jnp.where(
                before, bi, jnp.where(at, vid, pltpu.roll(bi, 1, axis=1))
            )
            return jnp.where(hit, jnp.inf, remaining)

        jax.lax.fori_loop(0, rounds, extract_and_insert, dist)

    out_d_ref[0] = best_d[:]
    out_i_ref[0] = best_i[:]


@functools.lru_cache(maxsize=None)
def ivf_scan_program_multi(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int,
    db_dtype=jnp.float32, exact: bool = False, qps_step: int = 4,
):
    """Multi-query-per-step scan (see _ivf_scan_kernel_multi). b must be
    padded to a qps_step multiple by the caller."""
    assert b % qps_step == 0
    k_pad = _round_up(max(k, 1), LANE)
    kernel = functools.partial(
        _ivf_scan_kernel_multi, k=k, k_pad=k_pad, exact=exact,
        qps_step=qps_step,
    )

    def vec_spec(j):
        return pl.BlockSpec(
            (1, pad, dim),
            lambda g, p, lists, j=j: (lists[g * qps_step + j, p], 0, 0),
        )

    def aux_spec(j):
        return pl.BlockSpec(
            (1, 1, pad),
            lambda g, p, lists, j=j: (lists[g * qps_step + j, p], 0, 0),
        )

    in_specs = [pl.BlockSpec((b, dim), lambda g, p, lists: (0, 0))]
    for j in range(qps_step):
        in_specs += [vec_spec(j), aux_spec(j), aux_spec(j)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // qps_step, nprobe),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, qps_step, k_pad), lambda g, p, lists: (g, 0, 0)),
            pl.BlockSpec((1, qps_step, k_pad), lambda g, p, lists: (g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((qps_step, k_pad), jnp.float32),
            pltpu.VMEM((qps_step, k_pad), jnp.int32),
        ],
    )

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b // qps_step, qps_step, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b // qps_step, qps_step, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * dim,
            bytes_accessed=b * nprobe * pad * dim * jnp.dtype(db_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, queries, list_vecs, list_sqn, list_ids):
        sqn3 = list_sqn.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = []
        for _ in range(qps_step):
            args += [list_vecs, sqn3, ids3]
        out_d, out_i = call(lists, queries, *args)
        out_d = out_d.reshape(b, k_pad)[:, :k]
        out_i = out_i.reshape(b, k_pad)[:, :k]
        big = jnp.iinfo(jnp.int32).max
        return out_d, jnp.where(out_i == big, -1, out_i)

    return run


def _ivf_scan_kernel_dense(
    lists_ref,      # scalar-prefetch: (B, nprobe) int32 probed list ids
    q_ref,          # (B, D) all queries, VMEM-resident
    vecs_ref,       # (1, pad, D) the probed list's vectors
    sqn_ref,        # (1, 1, pad) the list's row norms
    ids_ref,        # (1, 1, pad) the list's external ids (-1 padding)
    out_d_ref,      # (1, 1, pad) raw distances, dense
    out_i_ref,      # (1, 1, pad) ids pass-through
    *,
    exact: bool,
):
    """Dense-output variant: NO in-kernel selection. Measured on v5e the
    insertion rounds dominate the scan step (q4 amortization of the fixed
    step cost gained only +1-12%), so for small nprobe*pad emit every
    masked distance and let XLA lex-sort outside — the same shape that
    took the refined-PQ path 13k -> 99k QPS (ops/adc_pallas.py dense
    variant). Both grid axes are parallel: no carried scratch."""
    q_idx = pl.program_id(0)
    q = q_ref[pl.ds(q_idx, 1), :]                  # (1, D)
    x = vecs_ref[0]                                # (pad, D)
    ip = jax.lax.dot_general(
        q.astype(x.dtype), x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )                                              # (1, pad)
    qf = q.astype(jnp.float32)
    dist = jnp.sum(qf * qf) + sqn_ref[0] - 2.0 * ip
    dist = jnp.maximum(dist, 0.0)
    ids = ids_ref[0]                               # (1, pad)
    out_d_ref[0] = jnp.where(ids >= 0, dist, jnp.inf)
    out_i_ref[0] = ids


@functools.lru_cache(maxsize=None)
def ivf_scan_program_dense(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int,
    db_dtype=jnp.float32, exact: bool = False,
):
    """Dense scan + XLA (dist, id)-lexicographic sort: bit-identical
    results to ivf_scan_program (same scoring, same lowest-id tie rule).
    Intended for nprobe * pad small enough that the sort is cheap."""
    kernel = functools.partial(_ivf_scan_kernel_dense, exact=exact)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((b, dim), lambda i, p, lists: (0, 0)),
            pl.BlockSpec((1, pad, dim), lambda i, p, lists: (lists[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (lists[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (lists[i, p], 0, 0)),
        ],
        # (b*nprobe, 1, pad) with a unit middle dim: (1, pad) last-two
        # block dims are legal only when they equal the array dims.
        out_specs=[
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (i * nprobe + p, 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (i * nprobe + p, 0, 0)),
        ],
        scratch_shapes=[],
    )

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.float32),
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * dim,
            bytes_accessed=b * nprobe * pad * dim * jnp.dtype(db_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, queries, list_vecs, list_sqn, list_ids):
        out_d, out_i = call(
            lists,
            queries,
            list_vecs,
            list_sqn.reshape(nlist, 1, pad),
            list_ids.reshape(nlist, 1, pad),
        )
        d2 = out_d.reshape(b, nprobe * pad)
        i2 = out_i.reshape(b, nprobe * pad)
        # Ascending lexicographic (dist, id): equal distances resolve to
        # the LOWEST id, exactly the in-kernel insertion rule. merge_topk
        # also PADS to width k with (inf, -1) when nprobe * pad < k —
        # callers rely on a fixed (B, k) output (ADVICE round 2, #1).
        return merge_topk(d2, i2, k)

    return run


def _ivf_scan_kernel_dense_int8(
    lists_ref,      # scalar-prefetch: (B, nprobe) int32 probed list ids
    q_ref,          # (1, 1, D) THIS query, int8 (blocked per grid step)
    qscale_ref,     # (1, 1, 1) f32 its quantization scale
    vecs_ref,       # (1, pad, D) the probed list's SQ8 codes, int8
    sqn_ref,        # (1, 1, pad) DECODED-space row norms, f32
    ids_ref,        # (1, 1, pad) external ids (-1 padding)
    out_d_ref,      # (1, 1, pad) dense scan keys (decoded dist - ||q||^2)
    out_i_ref,      # (1, 1, pad) ids pass-through
):
    """SQ8 dense scan: both MXU operands int8 (the double-rate systolic
    path — see ops/topk_pallas.py int8_q and CLAUDE.md). The caller folds
    the per-dimension SQ8 scale AND the -2 into the queries before row-
    quantizing, so the epilogue is one (1, pad) fma. The emitted key
    omits the per-query ||q||^2 constant (order-preserving); the caller's
    rerank stage re-scores the shortlist exactly in f32.

    Unlike the f32 dense kernel, the query arrives as a per-step (1, 1,
    D) BLOCK, not a dynamic row read of a resident (B, D) array: Mosaic
    cannot prove sublane alignment for a traced single-row int8 load
    ("index in dimension 0 is a multiple of 8", v5e)."""
    q = q_ref[0]                                   # (1, D) int8
    x = vecs_ref[0]                                # (pad, D) int8
    ip = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                              # (1, pad) int32
    rs = qscale_ref[0]                             # (1, 1) f32
    key = ip.astype(jnp.float32) * rs + sqn_ref[0]
    ids = ids_ref[0]                               # (1, pad)
    out_d_ref[0] = jnp.where(ids >= 0, key, jnp.inf)
    out_i_ref[0] = ids


def _ivf_scan_kernel_dense_int8_multi(
    lists_ref, *refs, qps_step: int,
):
    """qps_step-query variant of _ivf_scan_kernel_dense_int8: one grid
    step carries the blocks of several consecutive queries, amortizing
    the fixed per-step cost (the dense kernel IS step-cost-bound — its
    epilogue is one fma, so unlike the selection kernel the multi-query
    trick pays here). Outputs land in a (g, p, slot, pad) layout — the
    per-slot rows of one (1, 1, qps_step, pad) block (qps_step=8 keeps
    the sublane dim 8-divisible) — untangled by the caller."""
    qref = refs[0::5][:qps_step]
    sref = refs[1::5][:qps_step]
    vref = refs[2::5][:qps_step]
    nref = refs[3::5][:qps_step]
    iref = refs[4::5][:qps_step]
    out_d_ref, out_i_ref = refs[5 * qps_step:]
    for j in range(qps_step):
        q = qref[j][0]                                 # (1, D) int8
        x = vref[j][0]                                 # (pad, D) int8
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rs = sref[j][0]                                # (1, 1) f32
        key = ip.astype(jnp.float32) * rs + nref[j][0]
        ids = iref[j][0]
        out_d_ref[0, 0, pl.ds(j, 1), :] = jnp.where(ids >= 0, key, jnp.inf)
        out_i_ref[0, 0, pl.ds(j, 1), :] = ids


@functools.lru_cache(maxsize=None)
def ivf_scan_program_dense_int8(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, ks: int,
    qps_step: int = 1,
):
    """Dense SQ8 scan -> (keys (b, ks), ids (b, ks)) shortlist, ascending
    by the approximate key (key ties break by scan position, NOT id —
    the shortlist feeds an exact id-aware rerank, so top_k is used over
    the much costlier lex-sort). Queries must be pre-folded (x scale,
    x -2) and row-quantized by the caller (see ivf_sq8_search_program).
    qps_step > 1 processes that many queries per grid step (b must be a
    multiple; 8 keeps the shared output block's sublane dim legal)."""
    assert b % qps_step == 0
    assert qps_step in (1, 8)

    interpret = jax.default_backend() != "tpu"
    if qps_step == 1:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nprobe),
            in_specs=[
                pl.BlockSpec((1, 1, dim), lambda i, p, lists: (i, 0, 0)),
                pl.BlockSpec((1, 1, 1), lambda i, p, lists: (i, 0, 0)),
                pl.BlockSpec((1, pad, dim),
                             lambda i, p, lists: (lists[i, p], 0, 0)),
                pl.BlockSpec((1, 1, pad),
                             lambda i, p, lists: (lists[i, p], 0, 0)),
                pl.BlockSpec((1, 1, pad),
                             lambda i, p, lists: (lists[i, p], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, pad),
                             lambda i, p, lists: (i * nprobe + p, 0, 0)),
                pl.BlockSpec((1, 1, pad),
                             lambda i, p, lists: (i * nprobe + p, 0, 0)),
            ],
            scratch_shapes=[],
        )
        call = pl.pallas_call(
            _ivf_scan_kernel_dense_int8,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.float32),
                jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * nprobe * pad * dim,
                bytes_accessed=b * nprobe * pad * dim,
                transcendentals=0,
            ),
            interpret=interpret,
        )

        @jax.jit
        def run(lists, q_int8, q_scale, codes, dec_sqn, list_ids):
            out_d, out_i = call(
                lists,
                q_int8.reshape(b, 1, dim),
                q_scale.reshape(b, 1, 1),
                codes,
                dec_sqn.reshape(nlist, 1, pad),
                list_ids.reshape(nlist, 1, pad),
            )
            d2 = out_d.reshape(b, nprobe * pad)
            i2 = out_i.reshape(b, nprobe * pad)
            # The shortlist feeds an exact rerank, so selection by the
            # APPROXIMATE key alone suffices — top_k is far cheaper than
            # the (key, id) lex-sort at wide scans, and boundary ties
            # among quantization-equal candidates are harmless.
            d, i, pos = _shortlist_topk(d2, i2, ks)
            return d, i, _canvas_rows(pos, lists, pad)

        return run

    g = b // qps_step

    def q_spec(j, shape):
        return pl.BlockSpec(
            shape, lambda gi, p, lists, j=j: (gi * qps_step + j, 0, 0)
        )

    def l_spec(j, shape):
        return pl.BlockSpec(
            shape,
            lambda gi, p, lists, j=j: (lists[gi * qps_step + j, p], 0, 0),
        )

    in_specs = []
    for j in range(qps_step):
        in_specs += [
            q_spec(j, (1, 1, dim)),
            q_spec(j, (1, 1, 1)),
            l_spec(j, (1, pad, dim)),
            l_spec(j, (1, 1, pad)),
            l_spec(j, (1, 1, pad)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nprobe),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, qps_step, pad),
                         lambda gi, p, lists: (gi, p, 0, 0)),
            pl.BlockSpec((1, 1, qps_step, pad),
                         lambda gi, p, lists: (gi, p, 0, 0)),
        ],
        scratch_shapes=[],
    )
    call = pl.pallas_call(
        functools.partial(_ivf_scan_kernel_dense_int8_multi,
                          qps_step=qps_step),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, nprobe, qps_step, pad), jnp.float32),
            jax.ShapeDtypeStruct((g, nprobe, qps_step, pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * dim,
            bytes_accessed=b * nprobe * pad * dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, q_int8, q_scale, codes, dec_sqn, list_ids):
        q3 = q_int8.reshape(b, 1, dim)
        s3 = q_scale.reshape(b, 1, 1)
        dsq3 = dec_sqn.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = []
        for _ in range(qps_step):  # one spec set per slot, same arrays
            args += [q3, s3, codes, dsq3, ids3]
        out_d, out_i = call(lists, *args)
        # (g, p, slot, pad) -> (g, slot, p, pad) -> (b, nprobe * pad);
        # the transpose is one cheap pass over the small dense output
        d2 = out_d.transpose(0, 2, 1, 3).reshape(b, nprobe * pad)
        i2 = out_i.transpose(0, 2, 1, 3).reshape(b, nprobe * pad)
        d, i, pos = _shortlist_topk(d2, i2, ks)
        return d, i, _canvas_rows(pos, lists, pad)

    return run


@functools.lru_cache(maxsize=None)
def ivf_sq8_search_program(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, ks: int,
    qps_step: int | None = None,
):
    """Coarse ranking + SQ8 dense scan -> (keys, ids, rows) shortlist
    (each (b, ks)).

    The caller holds the per-dimension SQ8 scale (dim_scale, (D,) f32)
    and decoded-space row norms; queries are folded (x dim_scale x -2)
    and row-quantized here, on device. The shortlist is ordered by the
    approximate key only (position-order ties); the exact id-aware
    rerank (ops/rerank.py) downstream restores both exactness and the
    lowest-id tie contract — same composite as the flat int8 path
    (ops/topk_pallas.py). `rows` is each candidate's bucket-store row
    (list * pad + slot): reranks against the bucketed store gather by
    it directly (ops/rerank.exact_rerank_rows) instead of paying the
    issue-bound id->row table gather."""
    if qps_step is None:  # 8-slot steps when the batch and VMEM allow
        fits = 16 * pad * dim + 2 * 8 * pad * 8 <= 13 * 2**20
        qps_step = 8 if b % 8 == 0 and fits else 1
    scan = ivf_scan_program_dense_int8(
        nlist, pad, dim, b, nprobe, ks, qps_step
    )

    @jax.jit
    def run(centroids, c_sq, codes, dim_scale, dec_sqn, list_ids, queries):
        coarse = (
            c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        )
        _, probes = jax.lax.top_k(-coarse, nprobe)
        qs = queries.astype(jnp.float32) * dim_scale * -2.0
        rs = (
            jnp.maximum(jnp.max(jnp.abs(qs), axis=1, keepdims=True), 1e-30)
            / 127.0
        )
        qi = jnp.clip(jnp.rint(qs / rs), -127, 127).astype(jnp.int8)
        return scan(probes.astype(jnp.int32), qi, rs, codes, dec_sqn, list_ids)

    return run


@functools.lru_cache(maxsize=None)
def ivf_scan_program(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int,
    db_dtype=jnp.float32, exact: bool = False,
):
    """Returns jitted (lists, queries, list_vecs, list_sqn, list_ids) ->
    (dists (b, k), ids (b, k)) ascending per query.

    list_vecs: (nlist, pad, dim); list_sqn/list_ids: (nlist, pad).
    exact=True scores at Precision.HIGHEST (free — the step is DMA-bound):
    for f32 lists the results are exact f32, no rerank stage needed."""
    k_pad = _round_up(max(k, 1), LANE)
    kernel = functools.partial(_ivf_scan_kernel, k=k, k_pad=k_pad, exact=exact)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((b, dim), lambda i, p, lists: (0, 0)),
            pl.BlockSpec((1, pad, dim), lambda i, p, lists: (lists[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (lists[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, lists: (lists[i, p], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i, p, lists: (i, 0, 0)),
            pl.BlockSpec((1, 1, k_pad), lambda i, p, lists: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.int32),
        ],
    )

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * dim,
            bytes_accessed=b * nprobe * pad * dim * jnp.dtype(db_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, queries, list_vecs, list_sqn, list_ids):
        out_d, out_i = call(
            lists,
            queries,
            list_vecs,
            list_sqn.reshape(nlist, 1, pad),
            list_ids.reshape(nlist, 1, pad),
        )
        out_d = out_d[:, 0, :k]
        out_i = out_i[:, 0, :k]
        big = jnp.iinfo(jnp.int32).max
        return out_d, jnp.where(out_i == big, -1, out_i)

    return run


@functools.lru_cache(maxsize=None)
def ivf_full_search_program(
    nlist: int, pad: int, dim: int, b: int, nprobe: int, k: int,
    db_dtype=jnp.float32, exact: bool = False, qps_step: int = 1,
    dense: bool = False,
):
    """Coarse ranking (XLA matmul + top_k) then the Pallas list scan.

    dense=True routes through ivf_scan_program_dense (no in-kernel
    selection; XLA lex-sort outside) — bit-identical results, faster
    when nprobe * pad is small. qps_step>1 amortizes the fixed grid-step
    cost in the selection kernel (requires b % qps_step == 0)."""
    if dense:
        scan = ivf_scan_program_dense(nlist, pad, dim, b, nprobe, k,
                                      db_dtype, exact)
    elif qps_step > 1 and b % qps_step == 0:
        scan = ivf_scan_program_multi(
            nlist, pad, dim, b, nprobe, k, db_dtype, exact, qps_step
        )
    else:
        scan = ivf_scan_program(nlist, pad, dim, b, nprobe, k, db_dtype, exact)

    @jax.jit
    def run(centroids, c_sq, list_vecs, list_sqn, list_ids, queries):
        coarse = (
            c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        )
        _, probes = jax.lax.top_k(-coarse, nprobe)
        return scan(probes.astype(jnp.int32), queries, list_vecs, list_sqn, list_ids)

    return run
