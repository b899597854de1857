"""ADC MXU-utilization experiments (VERDICT round 2, next #4).

The production ADC kernel evaluates sum_j QD[j, code_jp] as m per-
subspace (1, ksub) x (ksub, pad) one-hot matmuls per (query, probe)
grid step — 48-96 M=1 matmuls/step, ~1% MXU utilization, ~20us/step at
10M shapes. Two cost hypotheses:
  (a) matmul ISSUE/FILL latency: M=1 matmuls pay the systolic fill per
      call; fewer, wider matmuls should win even at equal FLOPs.
  (b) the VPU one-hot build (m * ksub * pad compares) is itself a
      ~10-20us floor; only fewer compares win.

Variants measured against the production dense kernel, same process:
  V0  baseline: ops/adc_pallas.adc_dense_program
  V1  subspace-chunk: concatenate g one-hots along the sublane axis and
      contract with a pre-flattened (1, g*ksub) QD slice — m/g matmuls
      of K = g*ksub (tests (a); compares unchanged)
  V2  probe-concat: grid (b,), the query's nprobe code blocks DMA'd
      together, one-hots concatenated along LANES — m matmuls of
      N = nprobe*pad per QUERY (tests (a) orthogonally)
  V3  hi/lo Kronecker: onehot_256(c) = onehot_16(hi) (x) onehot_16(lo);
      per subspace: (16,16) QD block x OHlo (16,pad) matmul, then an
      OHhi-masked 16-sublane reduction — 16x fewer compares (tests (b))

Usage: python benchmarks/exp_adc_batch.py [--small]  (TPU)
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c99_vectordb_tpu.ops.adc_pallas import CODE_LANES, adc_dense_program

SMALL = "--small" in sys.argv
if SMALL:
    NLIST, PAD, M, KSUB, B, NPROBE = 8, 256, 8, 256, 8, 2
else:
    NLIST, PAD, M, KSUB, B, NPROBE = 64, 1920, 48, 256, 128, 4


# ---------------------------------------------------------------- V1


def _v1_kernel(
    lists_ref, qdf_ref, pc_ref, codes_ref, const_ref, ids_ref,
    out_d_ref, out_i_ref, *, ksub: int, m: int, g: int,
):
    p_idx = pl.program_id(1)
    codes = codes_ref[0].astype(jnp.int32)
    pad = codes.shape[1]
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (ksub, pad), 0)
    qdot = jnp.zeros((1, pad), jnp.float32)
    qdf = qdf_ref[0]                                  # (1, m*ksub)
    for c in range(m // g):
        sels = [
            (code_iota == codes[j : j + 1, :]).astype(jnp.float32)
            for j in range(c * g, (c + 1) * g)
        ]
        sel_cat = jnp.concatenate(sels, axis=0)       # (g*ksub, pad)
        qdot = qdot + jax.lax.dot_general(
            qdf[:, c * g * ksub : (c + 1) * g * ksub], sel_cat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    coarse = pc_ref[0, 0, p_idx]
    dist = jnp.maximum(coarse - 2.0 * qdot + const_ref[0], 0.0)
    ids = ids_ref[0]
    out_d_ref[0] = jnp.where(ids >= 0, dist, jnp.inf)
    out_i_ref[0] = ids


@functools.lru_cache(maxsize=None)
def v1_program(nlist, pad, m, ksub, b, nprobe, g):
    kernel = functools.partial(_v1_kernel, ksub=ksub, m=m, g=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, m * ksub), lambda i, p, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, nprobe), lambda i, p, L: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CODE_LANES, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
        ],
    )
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
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        qdf = qd[:, :m, :].reshape(b, 1, m * ksub)
        out_d, out_i = call(
            lists, qdf, probe_coarse.reshape(b, 1, nprobe), codes128,
            item_const.reshape(nlist, 1, pad), list_ids.reshape(nlist, 1, pad),
        )
        return out_d.reshape(b, nprobe * pad), out_i.reshape(b, nprobe * pad)

    return run


# ---------------------------------------------------------------- V2


def _v2_kernel(lists_ref, qd_ref, pc_ref, *refs, ksub: int, m: int, nprobe: int):
    codes_refs = refs[0:nprobe]
    const_refs = refs[nprobe : 2 * nprobe]
    ids_refs = refs[2 * nprobe : 3 * nprobe]
    out_d_ref, out_i_ref = refs[3 * nprobe :]
    qd = qd_ref[0]                                    # (CODE_LANES, ksub)
    pad = codes_refs[0].shape[2]
    wide = nprobe * pad
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (ksub, wide), 0)
    qdot = jnp.zeros((1, wide), jnp.float32)
    codes = [codes_refs[p][0].astype(jnp.int32) for p in range(nprobe)]
    for j in range(m):
        cj = jnp.concatenate(
            [codes[p][j : j + 1, :] for p in range(nprobe)], axis=1
        )                                             # (1, nprobe*pad)
        sel = (code_iota == cj).astype(jnp.float32)
        qdot = qdot + jax.lax.dot_general(
            qd[j : j + 1, :], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    parts_d = []
    parts_i = []
    for p in range(nprobe):
        coarse = pc_ref[0, 0, p]
        dist = jnp.maximum(
            coarse - 2.0 * qdot[:, p * pad : (p + 1) * pad] + const_refs[p][0],
            0.0,
        )
        ids = ids_refs[p][0]
        parts_d.append(jnp.where(ids >= 0, dist, jnp.inf))
        parts_i.append(ids)
    out_d_ref[0] = jnp.concatenate(parts_d, axis=1)
    out_i_ref[0] = jnp.concatenate(parts_i, axis=1)


@functools.lru_cache(maxsize=None)
def v2_program(nlist, pad, m, ksub, b, nprobe):
    kernel = functools.partial(_v2_kernel, ksub=ksub, m=m, nprobe=nprobe)

    def code_spec(p):
        return pl.BlockSpec(
            (1, CODE_LANES, pad), lambda i, L, p=p: (L[i, p], 0, 0)
        )

    def aux_spec(p):
        return pl.BlockSpec((1, 1, pad), lambda i, L, p=p: (L[i, p], 0, 0))

    in_specs = [
        pl.BlockSpec((1, CODE_LANES, ksub), lambda i, L: (i, 0, 0)),
        pl.BlockSpec((1, 1, nprobe), lambda i, L: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    in_specs += [code_spec(p) for p in range(nprobe)]
    in_specs += [aux_spec(p) for p in range(nprobe)]
    in_specs += [aux_spec(p) for p in range(nprobe)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, nprobe * pad), lambda i, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, nprobe * pad), lambda i, L: (i, 0, 0)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, nprobe * pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, nprobe * pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        const3 = item_const.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = [qd, probe_coarse.reshape(b, 1, nprobe)]
        args += [codes128] * nprobe
        args += [const3] * nprobe
        args += [ids3] * nprobe
        out_d, out_i = call(lists, *args)
        return out_d.reshape(b, nprobe * pad), out_i.reshape(b, nprobe * pad)

    return run


# ---------------------------------------------------------------- V3


def _v3_kernel(
    lists_ref, qd3_ref, pc_ref, codes_ref, const_ref, ids_ref,
    out_d_ref, out_i_ref, *, m: int,
):
    """hi/lo decomposition: QD[j, c] with c = 16*hi + lo becomes a (16,
    16) block; sum_c QD[j,c]*OH256[c,p] = sum_h OHhi[h,p] * (QDj @
    OHlo)[h,p]. Compares per subspace: 2*16*pad instead of 256*pad."""
    p_idx = pl.program_id(1)
    qd3 = qd3_ref[0]                                  # (m*16, 16)
    codes = codes_ref[0].astype(jnp.int32)
    pad = codes.shape[1]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (16, pad), 0)
    qdot = jnp.zeros((1, pad), jnp.float32)
    for j in range(m):
        cj = codes[j : j + 1, :]
        oh_lo = (hi_iota == (cj & 15)).astype(jnp.float32)     # (16, pad)
        oh_hi = (hi_iota == (cj >> 4)).astype(jnp.float32)     # (16, pad)
        x = jax.lax.dot_general(
            qd3[j * 16 : (j + 1) * 16, :], oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (16, pad)
        qdot = qdot + jnp.sum(oh_hi * x, axis=0, keepdims=True)
    coarse = pc_ref[0, 0, p_idx]
    dist = jnp.maximum(coarse - 2.0 * qdot + const_ref[0], 0.0)
    ids = ids_ref[0]
    out_d_ref[0] = jnp.where(ids >= 0, dist, jnp.inf)
    out_i_ref[0] = ids


@functools.lru_cache(maxsize=None)
def v3_program(nlist, pad, m, ksub, b, nprobe):
    assert ksub == 256
    kernel = functools.partial(_v3_kernel, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((1, m * 16, 16), lambda i, p, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, nprobe), lambda i, p, L: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CODE_LANES, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (L[i, p], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
            pl.BlockSpec((1, 1, pad), lambda i, p, L: (i, 0, p)),
        ],
    )
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
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, probe_coarse, qd, codes128, item_const, list_ids):
        # QD rows j -> (16, 16) blocks: qd[:, j, 16*h + l] = qd3[j*16+h, l]
        qd3 = qd[:, :m, :].reshape(b, m * 16, 16)
        out_d, out_i = call(
            lists, qd3, probe_coarse.reshape(b, 1, nprobe), codes128,
            item_const.reshape(nlist, 1, pad), list_ids.reshape(nlist, 1, pad),
        )
        return out_d.reshape(b, nprobe * pad), out_i.reshape(b, nprobe * pad)

    return run


# ---------------------------------------------------------------- harness


def main():
    key = jax.random.PRNGKey(0)
    qd = jax.random.normal(key, (B, CODE_LANES, KSUB), jnp.float32)
    qd = qd.at[:, M:, :].set(0.0)
    codes128 = jnp.concatenate(
        [
            jax.random.randint(
                jax.random.PRNGKey(1), (NLIST, M, PAD), 0, KSUB, jnp.int32
            ).astype(jnp.uint8),
            jnp.zeros((NLIST, CODE_LANES - M, PAD), jnp.uint8),
        ],
        axis=1,
    )
    item_const = jax.random.normal(jax.random.PRNGKey(2), (NLIST, PAD))
    li = np.arange(NLIST * PAD, dtype=np.int32).reshape(NLIST, PAD)
    li[:, -8:] = -1
    li = jnp.asarray(li)
    pc = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, NPROBE)))
    lists = jax.random.randint(
        jax.random.PRNGKey(4), (B, NPROBE), 0, NLIST, jnp.int32
    )

    progs = {
        "v0_baseline": adc_dense_program(NLIST, PAD, M, KSUB, B, NPROBE),
        "v1_chunk_g4": v1_program(NLIST, PAD, M, KSUB, B, NPROBE, 4),
        "v2_probecat": v2_program(NLIST, PAD, M, KSUB, B, NPROBE),
        "v3_hilo": v3_program(NLIST, PAD, M, KSUB, B, NPROBE),
    }
    if not SMALL and PAD <= 512:
        progs["v1_chunk_g8"] = v1_program(NLIST, PAD, M, KSUB, B, NPROBE, 8)

    args = (lists, pc, qd, codes128, item_const, li)
    ref_d, ref_i = None, None
    results = {}
    for name, prog in progs.items():
        try:
            t0 = time.perf_counter()
            d, i = prog(*args)
            jax.block_until_ready((d, i))
            compile_t = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if ref_d is None:
            ref_d, ref_i = np.asarray(d), np.asarray(i)
            err = 0.0
        else:
            err = float(np.nanmax(np.abs(np.where(
                np.isinf(ref_d), 0.0, np.asarray(d) - ref_d
            ))))
            assert (np.asarray(i) == ref_i).all(), f"{name}: ids differ"

        @jax.jit
        def chain(steps_marker, qd_in, *rest):
            def body(s, _):
                d, _i = prog(rest[0], rest[1], qd_in + s * 0.0, *rest[2:])
                return s + d[0, 0] * 0.0 + 1.0, None

            s, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None,
                length=steps_marker.shape[0],
            )
            return s

        def timed(steps):
            mk = jnp.zeros((steps,))
            float(chain(mk, qd, lists, pc, codes128, item_const, li))
            t0 = time.perf_counter()
            float(chain(mk, qd, lists, pc, codes128, item_const, li))
            return time.perf_counter() - t0

        lo, hi = 2, 10
        t_lo = timed(lo)
        while True:
            t_hi = timed(hi)
            if t_hi > 1.5 * t_lo or hi >= 320:
                break
            hi *= 4
        per_batch = (t_hi - t_lo) / (hi - lo)
        us_per_qp = per_batch / (B * NPROBE) * 1e6
        results[name] = us_per_qp
        print(
            f"{name}: {us_per_qp:.2f} us/(query*probe) "
            f"({B / per_batch:,.0f} QPS-equiv at p={NPROBE}; "
            f"max|d-d0|={err:.2e}; compile {compile_t:.1f}s)",
            flush=True,
        )
    if "v0_baseline" in results:
        base = results["v0_baseline"]
        for name, v in results.items():
            if name != "v0_baseline":
                print(f"{name}: {base / v:.2f}x vs baseline")


if __name__ == "__main__":
    main()
