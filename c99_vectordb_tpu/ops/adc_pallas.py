"""Pallas ADC (asymmetric distance computation) kernel for IVF-PQ search.

The XLA ADC path gathers a per-query lookup table with take_along_axis —
a generic gather that runs ~100x below achievable rates on TPU, and
Mosaic supports no in-kernel dynamic gather at all (probed 2026-08-16).
This kernel avoids the residual-LUT gather entirely by algebra:

  d(q, item) = || (q - c) - y ||^2   summed over subspaces j, where
               c = item's coarse centroid, y_j = codebook_j[code_j]
             = ||q - c||^2                       (the COARSE distance)
               - 2 * sum_j q_j . y_jc_j          (query-only dot table QD)
               + sum_j (2 c_j . y_jc_j + ||y_jc_j||^2)
                 == ||x_hat||^2 - ||c||^2        (per-ITEM constant)

so per probed item the kernel needs: the coarse distance (computed by the
XLA prologue's top-k), a per-item constant baked at BUILD time, and
sum_j QD[j, code_j] — a lookup into the (m, 256) query table that is
VMEM-resident per grid step and evaluated with one-hot matmuls (the one
Mosaic-legal "gather"). At ksub == 256 the one-hot is built via the
hi/lo Kronecker split (_qdot_hilo) — 16x fewer VPU compares, measured
3.55x end-to-end (round 3, benchmarks/exp_adc_batch.py).

Grid: (B, nprobe), probe ids scalar-prefetched exactly like the IVF-Flat
scan (ops/ivf_scan_pallas.py); per-query top-k carried in VMEM scratch
with the adaptive sorted-insertion update. HBM traffic per step is just
the list's codes (pad x 128 bytes) + ids + constants.

Tie-break note (ADVICE round 1): with refine on (the default), final
order always comes from the rerank's (distance, id) merge, identical on
every backend. The PURE-ADC path (refine=False) keeps this kernel's
insertion order on equal estimates — probe order, not lowest id — which
can differ from the XLA fallback's merge on exact ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CODE_LANES = 128          # m padded up to one lane tile of subspaces


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _qdot_hilo(qd3, codes, m: int):
    """sum_j QD[j, code_jp] via the hi/lo Kronecker split (ksub == 256).

    onehot_256(c) = onehot_16(c >> 4) (x) onehot_16(c & 15), so per
    subspace the contraction is one (16, 16) QD block x (16, pad) lo
    one-hot MXU matmul followed by a hi-one-hot-masked 16-sublane
    reduction. Compares drop 16x vs the flat (ksub, pad) one-hot —
    measured 3.55x on the whole dense kernel at 10M shapes with
    bit-identical output (benchmarks/exp_adc_batch.py v3; the flat
    build was VPU-compare-bound, not matmul-bound: fusing matmuls alone
    measured 1.02x).

    qd3: (m*16, 16) f32 with qd3[16 j + h, l] = QD[j, 16 h + l];
    codes: (>=m, pad) int32. Returns (1, pad) f32.
    """
    pad = codes.shape[1]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (16, pad), 0)
    qdot = jnp.zeros((1, pad), jnp.float32)
    for j in range(m):
        cj = codes[j : j + 1, :]
        oh_lo = (hi_iota == (cj & 15)).astype(jnp.float32)
        oh_hi = (hi_iota == (cj >> 4)).astype(jnp.float32)
        x = jax.lax.dot_general(
            qd3[j * 16 : (j + 1) * 16, :], oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qdot = qdot + jnp.sum(oh_hi * x, axis=0, keepdims=True)
    return qdot


def _qdot_onehot(qd, codes, m: int, ksub: int):
    """Flat (ksub, pad) one-hot fallback for odd ksub values (the
    Pallas path runs at ksub 256 (hi/lo) or 16 (nibble-packed) in
    production; this keeps the kernels correct for any ksub)."""
    pad = codes.shape[1]
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (ksub, pad), 0)
    qdot = jnp.zeros((1, pad), jnp.float32)
    for j in range(m):
        sel = (code_iota == codes[j : j + 1, :]).astype(jnp.float32)
        qdot = qdot + jax.lax.dot_general(
            qd[j : j + 1, :], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return qdot


def _qdot_nibble(qd, packed, m: int):
    """4-bit subquantizers (ksub == 16), NIBBLE-PACKED codes — the
    Quick-ADC storage point: subspaces 2j / 2j+1 live in the lo / hi
    nibble of packed row j, so codes cost m/2 bytes/vector and the
    per-step code DMA halves. In-kernel unpack is two VPU ops per
    packed row; each subspace contracts a (16, pad) one-hot against
    its (1, 16) QD row.

    qd: (>= m, 16) f32; packed: (>= m/2, pad) int32 (0..255).
    Requires even m. Returns (1, pad) f32.
    """
    pad = packed.shape[1]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, pad), 0)
    qdot = jnp.zeros((1, pad), jnp.float32)
    for j in range(m // 2):
        row = packed[j : j + 1, :]
        for sub, cj in ((2 * j, row & 15), (2 * j + 1, row >> 4)):
            sel = (iota16 == cj).astype(jnp.float32)
            qdot = qdot + jax.lax.dot_general(
                qd[sub : sub + 1, :], sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return qdot


def _qdot(qd_ref, codes_ref, m: int, ksub: int, mode: str):
    """Dispatch the qdot evaluation mode chosen by `_qdot_mode`."""
    codes = codes_ref[0].astype(jnp.int32)
    if mode == "hilo":
        return _qdot_hilo(qd_ref[0], codes, m)
    if mode == "nibble4":
        return _qdot_nibble(qd_ref[0], codes, m)
    return _qdot_onehot(qd_ref[0], codes, m, ksub)


def _qdot_mode(ksub: int, m: int) -> str:
    if ksub == 256:
        return "hilo"
    if ksub == 16 and m % 2 == 0:
        return "nibble4"
    return "flat"


@functools.lru_cache(maxsize=None)
def _stage_codes128_program(m: int, nibble: bool):
    @jax.jit
    def run(c):
        if nibble:
            c = c[:, :, 0::2] | (c[:, :, 1::2] << 4)
        rows = c.shape[2]
        canvas_rows = CODE_LANES // 2 if nibble else CODE_LANES
        return jnp.pad(
            c.transpose(0, 2, 1), ((0, 0), (0, canvas_rows - rows), (0, 0))
        )

    return run


def stage_codes128_device(list_codes, m: int, ksub: int):
    """(nlist, pad, m) device uint8 codes -> the kernel's subspace-major
    (nlist, CODE_LANES, pad) canvas (CODE_LANES/2 rows, nibble-packed,
    for 4-bit codebooks) in ONE jitted program — corpus-scale builds
    must not materialize the unpacked canvas next to the packed one
    (benchmarks/run10m.py measured that OOMing a v5e at 10M)."""
    nibble = ksub == 16 and m % 2 == 0
    return _stage_codes128_program(m, nibble)(list_codes)


@functools.lru_cache(maxsize=None)
def _unstage_codes128_program(m: int, nibble: bool):
    @jax.jit
    def run(c):
        if nibble:
            packed = c[:, : m // 2, :]
            lo = packed & 15
            hi = (packed >> 4) & 15
            nlist, _, pad = packed.shape
            inter = jnp.stack([lo, hi], axis=2).reshape(nlist, m, pad)
            return inter.transpose(0, 2, 1).astype(jnp.uint8)
        return c[:, :m, :].transpose(0, 2, 1).astype(jnp.uint8)

    return run


def unstage_codes128_device(codes128, m: int, ksub: int):
    """Inverse of stage_codes128_device: canvas -> (nlist, pad, m) uint8.

    Off the hot path (restage / ranked_all reconstruction in device
    mode, where the row-major code matrix is not retained)."""
    nibble = ksub == 16 and m % 2 == 0
    return _unstage_codes128_program(m, nibble)(codes128)


def pack_nibbles(codes128):
    """(nlist, CODE_LANES, pad) uint8 4-bit codes -> (nlist,
    CODE_LANES // 2, pad) packed: subspace 2j in the lo nibble of row j,
    2j+1 in the hi nibble. Host- or device-side (pure elementwise)."""
    lo = codes128[:, 0::2, :]
    hi = codes128[:, 1::2, :]
    return (lo | (hi << 4)).astype(codes128.dtype)


def _adc_kernel(
    lists_ref,      # scalar-prefetch: (B, nprobe) int32 probed list ids
    qd_ref,         # (1, CODE_LANES, ksub) query dot table (rows >= m are 0)
    pc_ref,         # SMEM (1, 1, nprobe): coarse distance of each probe
    codes_ref,      # (1, CODE_LANES, pad) uint8, subspace-major (rows >= m are 0)
    const_ref,      # (1, 1, pad) per-item constant
    ids_ref,        # (1, 1, pad) external ids, -1 padding
    out_d_ref,      # (1, 1, k_pad)
    out_i_ref,      # (1, 1, k_pad)
    best_d,         # scratch (1, k_pad)
    best_i,         # scratch (1, k_pad)
    *,
    k: int,
    k_pad: int,
    ksub: int,
    m: int,
    mode: str,
):
    p_idx = pl.program_id(1)

    @pl.when(p_idx == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d[:], jnp.inf)
        best_i[:] = jnp.full_like(best_i[:], jnp.iinfo(jnp.int32).max)

    # sum_j QD[j, code_j]: hi/lo Kronecker at ksub == 256 (3.55x — see
    # _qdot_hilo), nibble-unpacked 16-one-hots at ksub == 16 (packed
    # codes, m/2 bytes/vector), flat one-hot otherwise. Strictly 2-D
    # elementwise + matmul ops in every mode — Mosaic miscompiles 3-D
    # vector reductions and batched matvecs for these shapes.
    qdot = _qdot(qd_ref, codes_ref, m, ksub, mode)
    pad = qdot.shape[1]
    coarse = pc_ref[0, 0, p_idx]                    # scalar from SMEM
    dist = coarse - 2.0 * qdot + const_ref[0]       # (1, pad)
    dist = jnp.maximum(dist, 0.0)
    ids = ids_ref[0]                                # (1, pad)
    dist = jnp.where(ids >= 0, dist, jnp.inf)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, pad), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    worst = best_d[0, k - 1]
    rounds = jnp.minimum(jnp.sum((dist < worst).astype(jnp.int32)), k)

    def extract_and_insert(_, remaining):
        m = jnp.min(remaining, axis=1, keepdims=True)
        first = jnp.min(jnp.where(remaining == m, col, pad), axis=1, keepdims=True)
        hit = col == first
        vid = jnp.sum(jnp.where(hit, ids, 0), axis=1, keepdims=True)
        bd = best_d[:]
        bi = best_i[:]
        pos = jnp.sum((bd <= m).astype(jnp.int32), axis=1, keepdims=True)
        before = out_col < pos
        at = out_col == pos
        best_d[:] = jnp.where(before, bd, jnp.where(at, m, pltpu.roll(bd, 1, axis=1)))
        best_i[:] = jnp.where(before, bi, jnp.where(at, vid, pltpu.roll(bi, 1, axis=1)))
        return jnp.where(hit, jnp.inf, remaining)

    jax.lax.fori_loop(0, rounds, extract_and_insert, dist)

    out_d_ref[0] = best_d[:]
    out_i_ref[0] = best_i[:]


@functools.lru_cache(maxsize=None)
def adc_scan_program(nlist: int, pad: int, m: int, ksub: int, b: int, nprobe: int, k: int):
    """Jitted (lists, probe_coarse, qd, codes128, item_const, list_ids) ->
    (dists (b, k), ids (b, k)).

    codes128: (nlist, 128, pad) uint8 SUBSPACE-MAJOR, rows >= m zeroed;
    qd: (b, 128, ksub) f32 with rows >= m zeroed; item_const: (nlist, pad);
    probe_coarse: (b, nprobe) coarse distances aligned with `lists`."""
    k_pad = _round_up(max(k, 1), LANE)
    mode = _qdot_mode(ksub, m)
    hilo = mode == "hilo"
    code_rows = CODE_LANES // 2 if mode == "nibble4" else CODE_LANES
    kernel = functools.partial(
        _adc_kernel, k=k, k_pad=k_pad, ksub=ksub, m=m, mode=mode
    )
    qd_spec = (
        pl.BlockSpec((1, m * 16, 16), lambda i, p, L: (i, 0, 0))
        if hilo
        else pl.BlockSpec((1, CODE_LANES, ksub), lambda i, p, L: (i, 0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            qd_spec,
            pl.BlockSpec(
                (1, 1, nprobe), lambda i, p, L: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, code_rows, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i, p, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, k_pad), lambda i, p, L: (i, 0, 0)),
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
            flops=2 * b * nprobe * pad * m * ksub,
            bytes_accessed=b * nprobe * pad * (CODE_LANES + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        # hi/lo layout: QD rows become (16, 16) blocks, qd3[16j + h, l]
        # = QD[j, 16h + l] (a row-major reshape of the first m rows).
        qd_in = qd[:, :m, :].reshape(b, m * 16, 16) if hilo else qd
        out_d, out_i = call(
            lists,
            qd_in,
            probe_coarse.reshape(b, 1, nprobe),
            codes128,
            item_const.reshape(nlist, 1, pad),
            list_ids.reshape(nlist, 1, pad),
        )
        out_d = out_d[:, 0, :k]
        out_i = out_i[:, 0, :k]
        big = jnp.iinfo(jnp.int32).max
        return out_d, jnp.where(out_i == big, -1, out_i)

    return run


def _adc_dense_kernel(
    lists_ref, qd_ref, pc_ref, codes_ref, const_ref, ids_ref,
    out_d_ref, out_i_ref, *, ksub: int, m: int, mode: str,
):
    """ADC estimates WITHOUT in-kernel selection: emits the probed list's
    dense (1, pad) distances + ids per grid step. For deep-shortlist
    refine flows the in-kernel sorted-insertion top-k is the bottleneck
    (rounds scale with k: top-200 costs ~200 VPU insertion rounds per
    probe), while the refine stage re-sorts exactly anyway — so skip
    selection entirely and let XLA top_k shortlist the dense output."""
    p_idx = pl.program_id(1)
    qdot = _qdot(qd_ref, codes_ref, m, ksub, mode)
    coarse = pc_ref[0, 0, p_idx]
    dist = jnp.maximum(coarse - 2.0 * qdot + const_ref[0], 0.0)
    ids = ids_ref[0]
    out_d_ref[0] = jnp.where(ids >= 0, dist, jnp.inf)
    out_i_ref[0] = ids


def _adc_dense_kernel_multi(lists_ref, *refs, m: int, mode: str,
                            ksub: int, qps: int):
    """qps-query variant of _adc_dense_kernel: one grid step carries
    several consecutive queries' QD tables + their probed lists' code/
    const/ids blocks (stride-5 per-slot refs, like the SQ8 multi
    kernel). With the hi/lo qdot the per-step COMPUTE is ~1us while the
    fixed step cost is ~1-2us, so amortizing the step across slots pays
    — the round-2 note that multi-slot 'does not help ADC' predates
    hi/lo, when compute dominated. Per-slot SEPARATE output canvases
    avoid the SQ8 kernel's 8-multiple shared-block constraint."""
    qd_refs = refs[0::5][:qps]
    pc_refs = refs[1::5][:qps]
    codes_refs = refs[2::5][:qps]
    const_refs = refs[3::5][:qps]
    ids_refs = refs[4::5][:qps]
    outs = refs[5 * qps:]
    p_idx = pl.program_id(1)
    for j in range(qps):
        qdot = _qdot(qd_refs[j], codes_refs[j], m, ksub, mode)
        coarse = pc_refs[j][0, 0, p_idx]
        dist = jnp.maximum(coarse - 2.0 * qdot + const_refs[j][0], 0.0)
        ids = ids_refs[j][0]
        outs[2 * j][0] = jnp.where(ids >= 0, dist, jnp.inf)
        outs[2 * j + 1][0] = ids


@functools.lru_cache(maxsize=None)
def adc_dense_program_multi(
    nlist: int, pad: int, m: int, ksub: int, b: int, nprobe: int, qps: int
):
    """Multi-slot dense ADC scan: grid (b/qps, nprobe), qps queries per
    step. Same (b, nprobe*pad) outputs as adc_dense_program (each slot
    writes its own canvas; run() interleaves the slot rows back)."""
    assert b % qps == 0
    mode = _qdot_mode(ksub, m)
    hilo = mode == "hilo"
    code_rows = CODE_LANES // 2 if mode == "nibble4" else CODE_LANES
    kernel = functools.partial(
        _adc_dense_kernel_multi, m=m, mode=mode, ksub=ksub, qps=qps
    )
    g = b // qps

    def qd_spec(j):
        shape = (1, m * 16, 16) if hilo else (1, CODE_LANES, ksub)
        return pl.BlockSpec(
            shape, lambda gi, p, L, j=j: (gi * qps + j, 0, 0)
        )

    def pc_spec(j):
        return pl.BlockSpec(
            (1, 1, nprobe), lambda gi, p, L, j=j: (gi * qps + j, 0, 0),
            memory_space=pltpu.SMEM,
        )

    def code_spec(j):
        return pl.BlockSpec(
            (1, code_rows, pad),
            lambda gi, p, L, j=j: (L[gi * qps + j, p], 0, 0),
        )

    def aux_spec(j):
        return pl.BlockSpec(
            (1, 1, pad), lambda gi, p, L, j=j: (L[gi * qps + j, p], 0, 0)
        )

    def out_spec(j):
        # Per-slot canvases are (g * nprobe, 1, pad) — slot j's rows
        # only — NOT (b * nprobe, ...): qps full-size canvases would
        # allocate qps x the dense output (~1 GB at the 10M deep-probe
        # shape) with 7/8 of the rows never written.
        return pl.BlockSpec(
            (1, 1, pad),
            lambda gi, p, L, j=j: (gi * nprobe + p, 0, 0),
        )

    in_specs = []
    for j in range(qps):
        in_specs += [qd_spec(j), pc_spec(j), code_spec(j), aux_spec(j),
                     aux_spec(j)]
    out_specs = []
    shapes = []
    for j in range(qps):
        out_specs += [out_spec(j), out_spec(j)]
        shapes += [
            jax.ShapeDtypeStruct((g * nprobe, 1, pad), jnp.float32),
            jax.ShapeDtypeStruct((g * nprobe, 1, pad), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nprobe),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * m * 16,
            bytes_accessed=b * nprobe * pad * (CODE_LANES + 8),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        qd_in = qd[:, :m, :].reshape(b, m * 16, 16) if hilo else qd
        pc3 = probe_coarse.reshape(b, 1, nprobe)
        const3 = item_const.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = []
        for _ in range(qps):
            args += [qd_in, pc3, codes128, const3, ids3]
        outs = call(lists, *args)
        d_parts = []
        i_parts = []
        for j in range(qps):
            d_parts.append(outs[2 * j].reshape(g, nprobe, pad))
            i_parts.append(outs[2 * j + 1].reshape(g, nprobe, pad))
        # slot j's canvas holds queries g*qps + j; interleave back.
        d_all = jnp.stack(d_parts, axis=1).reshape(b, nprobe * pad)
        i_all = jnp.stack(i_parts, axis=1).reshape(b, nprobe * pad)
        return d_all, i_all

    return run


@functools.lru_cache(maxsize=None)
def adc_dense_program(nlist: int, pad: int, m: int, ksub: int, b: int, nprobe: int):
    """Jitted (lists, probe_coarse, qd, codes128, item_const, list_ids) ->
    dense (dists (b, nprobe*pad), ids (b, nprobe*pad))."""
    mode = _qdot_mode(ksub, m)
    hilo = mode == "hilo"
    code_rows = CODE_LANES // 2 if mode == "nibble4" else CODE_LANES
    kernel = functools.partial(_adc_dense_kernel, ksub=ksub, m=m, mode=mode)
    qd_spec = (
        pl.BlockSpec((1, m * 16, 16), lambda i, p, L: (i, 0, 0))
        if hilo
        else pl.BlockSpec((1, CODE_LANES, ksub), lambda i, p, L: (i, 0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            qd_spec,
            pl.BlockSpec(
                (1, 1, nprobe), lambda i, p, L: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, code_rows, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
        ],
        out_specs=[
            # One (1, 1, pad) block per (query, probe), laid out along the
            # LANE axis as (b, 1, nprobe*pad): a (1, pad) trailing block is
            # Mosaic-legal for any nprobe (a (1, 1, pad) block over a
            # (b, nprobe, pad) array is NOT — middle dim 1 != nprobe).
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
        ],
    )

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, nprobe * pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, nprobe * pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * pad * m * ksub,
            bytes_accessed=b * nprobe * pad * (CODE_LANES + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        qd_in = qd[:, :m, :].reshape(b, m * 16, 16) if hilo else qd
        out_d, out_i = call(
            lists,
            qd_in,
            probe_coarse.reshape(b, 1, nprobe),
            codes128,
            item_const.reshape(nlist, 1, pad),
            list_ids.reshape(nlist, 1, pad),
        )
        return out_d.reshape(b, nprobe * pad), out_i.reshape(b, nprobe * pad)

    return run


@functools.lru_cache(maxsize=None)
def adc_dense_search_program(
    nlist: int, pad: int, dim: int, m: int, ksub: int, b: int, nprobe: int,
    k_adc: int, qps_step: int | None = None, return_rows: bool = False,
):
    """Coarse prologue + dense ADC scan + shortlist selection: the fast
    path for refine flows with deep shortlists (k_adc >> 10).

    qps_step=None auto-picks 8-slot grid steps when the batch divides
    and VMEM allows — the hi/lo qdot made the dense scan step-cost-
    bound, so amortizing the fixed step across 8 queries pays (measured
    below; see _adc_dense_kernel_multi).

    return_rows=True additionally returns each shortlist candidate's
    bucket row (probed_list * pad + slot) — recovered from the dense
    position by pure arithmetic, so per-shard refines can gather their
    LOCAL slot store without an id->row table (the slot-sharded PQ
    route, parallel/sharded.py)."""
    if qps_step is None:
        fits = 8 * 2 * (CODE_LANES * pad + 1024 * m + 8 * pad) <= 13 * 2**20
        # m > 96 measured OOM (16.75M vs the 16M scoped-VMEM limit at
        # m=128, pad=384) despite the estimate above — it misses the
        # hi/lo qd scratch growth; m=96 is the largest verified fit.
        qps_step = 8 if b % 8 == 0 and fits and m <= 96 else 1
    if qps_step > 1:
        scan = adc_dense_program_multi(nlist, pad, m, ksub, b, nprobe,
                                       qps_step)
    else:
        scan = adc_dense_program(nlist, pad, m, ksub, b, nprobe)
    dsub = dim // m

    @jax.jit
    def run(centroids, c_sq, codebooks, codes128, item_const, list_ids, queries):
        coarse = (
            jnp.sum(queries * queries, axis=1, keepdims=True)
            + c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        )
        neg, probes = jax.lax.top_k(-coarse, nprobe)
        probe_coarse = jnp.maximum(-neg, 0.0)
        q_sub = queries.reshape(b, m, dsub)
        qd = jnp.einsum(
            "bjd,jcd->bjc", q_sub, codebooks, preferred_element_type=jnp.float32
        )
        qd = jnp.pad(qd, ((0, 0), (0, CODE_LANES - m), (0, 0)))
        dense_d, dense_i = scan(
            probes.astype(jnp.int32), probe_coarse, qd, codes128, item_const, list_ids
        )
        kk = min(k_adc, dense_d.shape[1])
        # The shortlist feeds an exact rerank — only the selected SET
        # matters. approx_min_k measured 3.3x cheaper than top_k at
        # (11264 -> 1024) with 1.000 overlap (exp_approx_topk.py), but
        # DEGENERATES when kk is a large fraction of the width (selecting
        # 200 of 384 measured slower than exact — exp_pq_stages.py), so
        # gate on kk <= width/4.
        from .ivf_scan_pallas import _use_approx_select

        if _use_approx_select() and 4 * kk <= dense_d.shape[1]:
            d_top, pos = jax.lax.approx_min_k(
                dense_d, kk, recall_target=0.999
            )
        else:
            neg_top, pos = jax.lax.top_k(-dense_d, kk)
            d_top = -neg_top
        top_i = jnp.take_along_axis(dense_i, pos, axis=1)
        if return_rows:
            # Dense column c = probe_rank * pad + slot; bucket row =
            # probed_list * pad + slot (axis-1 gathers only — cheap).
            rows = (
                jnp.take_along_axis(probes, pos // pad, axis=1) * pad
                + pos % pad
            ).astype(jnp.int32)
            return d_top, top_i, rows
        return d_top, top_i

    return run


@functools.lru_cache(maxsize=None)
def adc_full_search_program(
    nlist: int, pad: int, dim: int, m: int, ksub: int, b: int, nprobe: int, k: int
):
    """Coarse XLA prologue (centroid matmul + top-k + query dot table) then
    the Pallas ADC scan."""
    scan = adc_scan_program(nlist, pad, m, ksub, b, nprobe, k)
    dsub = dim // m

    @jax.jit
    def run(centroids, c_sq, codebooks, codes128, item_const, list_ids, queries):
        coarse = (
            jnp.sum(queries * queries, axis=1, keepdims=True)
            + c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        )
        neg, probes = jax.lax.top_k(-coarse, nprobe)
        probe_coarse = jnp.maximum(-neg, 0.0)

        # QD[b, j, c] = q_bj . codebook_jc — one MXU einsum per batch.
        q_sub = queries.reshape(b, m, dsub)
        qd = jnp.einsum(
            "bjd,jcd->bjc", q_sub, codebooks, preferred_element_type=jnp.float32
        )
        qd = jnp.pad(qd, ((0, 0), (0, CODE_LANES - m), (0, 0)))

        return scan(
            probes.astype(jnp.int32), probe_coarse, qd, codes128, item_const, list_ids
        )

    return run


def build_item_constants(
    centroids, assign, codes, codebooks, list_order, sorted_lists, slots, nlist, pad
):
    """Host-side build of the per-item ADC constant, scattered into the
    padded list layout: const[item] = ||x_hat||^2 - ||c||^2
                                    = sum_j (2 c_j . y_j + ||y_j||^2).

    centroids (nlist, D) f32; assign (n,) int32; codes (n, m) uint8;
    codebooks (m, ksub, dsub) f32. list_order/sorted_lists/slots are the
    same bucketing arrays used to scatter codes/ids."""
    import numpy as np

    n, m = codes.shape
    dsub = codebooks.shape[2]
    cent_sub = centroids.reshape(centroids.shape[0], m, dsub)
    const = np.zeros((n,), np.float32)
    for j in range(m):
        y = codebooks[j][codes[:, j]]                      # (n, dsub)
        c_j = cent_sub[assign, j]                          # (n, dsub)
        const += 2.0 * np.einsum("nd,nd->n", c_j, y) + np.einsum("nd,nd->n", y, y)
    out = np.zeros((nlist, pad), np.float32)
    out[sorted_lists, slots] = const[list_order]
    return out


def build_item_constants_device(
    centroids, assign, codes, codebooks, list_order, sorted_lists, slots,
    nlist: int, pad: int
):
    """Device-resident build_item_constants: same math, jnp end to end.

    Exists so corpus-scale builds never pull the (n, m) code matrix back
    to the host just to compute this constant — at 10M x m=48 that pull
    is 480 MB through a 1-30 MB/s link (CLAUDE.md hazard #3). All
    operands are (or are moved) on device; returns (nlist, pad) f32 on
    device. Parity with the host version is pinned by
    tests/test_adc_pallas.py."""
    n, m = codes.shape
    dsub = codebooks.shape[2]
    cent_sub = centroids.reshape(centroids.shape[0], m, dsub)
    # Chunk the (chunk, m, dsub) decode intermediates: materializing all
    # n at once is n*D floats (15 GB at 10M x 384); builds run this next
    # to an ~8 GB refine store, so keep the transient small.
    chunk = min(n, 65_536) or 1
    n_pad = ((n + chunk - 1) // chunk) * chunk

    @jax.jit
    def run(centroids_sub, assign, codes, codebooks, list_order,
            sorted_lists, slots):
        # Pad in the stored dtype; widen per chunk (a whole-corpus int32
        # code copy would be a 1.9 GB transient at 10M x m=48).
        assign_p = jnp.pad(assign, (0, n_pad - n)).reshape(-1, chunk)
        codes_p = jnp.pad(codes, ((0, n_pad - n), (0, 0))).reshape(-1, chunk, m)

        def step(_, inp):
            a, c = inp
            c_j = centroids_sub[a]                         # (chunk, m, dsub)
            y = jnp.take_along_axis(
                codebooks[None], c.astype(jnp.int32)[:, :, None, None], axis=2
            )[:, :, 0, :]                                  # (chunk, m, dsub)
            return None, jnp.sum((2.0 * c_j + y) * y, axis=(1, 2))

        _, const = jax.lax.scan(step, None, (assign_p, codes_p))
        const = const.reshape(-1)[:n]
        out = jnp.zeros((nlist, pad), jnp.float32)
        return out.at[sorted_lists, slots].set(const[list_order])

    return run(
        jnp.asarray(cent_sub), jnp.asarray(assign), jnp.asarray(codes),
        jnp.asarray(codebooks), jnp.asarray(list_order),
        jnp.asarray(sorted_lists), jnp.asarray(slots),
    )
