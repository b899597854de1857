"""f32 dense IVF multi-slot experiments (VERDICT round 2, next #8).

The p=1 f32 dense scan runs at 78-87% of the list-DMA roofline
(2.06us/step vs the 1.68us floor for a 1.18MB (384, 768) f32 block), so
the fixed per-step cost hides mostly UNDER the DMA — unlike SQ8, whose
4x-smaller blocks made it step-cost-bound and gave the 8-slot trick its
win. Expected ceiling here is therefore only ~+15-22%.

CLAUDE.md's round-3 lead notes 8 slots x 2 x 1.18MB > 16MB VMEM. Two
ways around it, both measured here:
  - qps 2/4 WITHOUT d-split: per-slot SEPARATE (1,1,pad) output blocks
    (the int8 kernel's shared (1,1,8,pad) block forced qps=8 for
    sublane legality; separate blocks have no such constraint), so
    4 x 1.18MB x 2(buffering) = 9.4MB fits.
  - qps 8 WITH a D-split accumulation grid: (g, nprobe, 2) with
    (pad, 384) half-blocks, partial inner products accumulated into
    the revisited output block ('arbitrary' d axis).

Usage: python benchmarks/exp_f32_multislot.py [--small]   (TPU)
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

from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_scan_program_dense

SMALL = "--small" in sys.argv
if SMALL:
    NLIST, PAD, D, B, NPROBE = 8, 128, 256, 8, 2
else:
    NLIST, PAD, D, B, NPROBE = 4096, 384, 768, 128, 1


# ------------------------------------------------- multi-slot, no d-split


def _dense_multi_kernel(lists_ref, q_ref, *refs, qps: int):
    vec_refs = refs[0::3][:qps]
    sqn_refs = refs[1::3][:qps]
    ids_refs = refs[2::3][:qps]
    outs = refs[3 * qps :]
    g_idx = pl.program_id(0)
    for j in range(qps):
        q = q_ref[pl.ds(g_idx * qps + j, 1), :]            # (1, D)
        x = vec_refs[j][0]                                 # (pad, D)
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dist = jnp.maximum(
            jnp.sum(q * q) + sqn_refs[j][0] - 2.0 * ip, 0.0
        )
        ids = ids_refs[j][0]
        outs[2 * j][0] = jnp.where(ids >= 0, dist, jnp.inf)
        outs[2 * j + 1][0] = ids


@functools.lru_cache(maxsize=None)
def dense_multi_program(nlist, pad, dim, b, nprobe, k, qps):
    assert b % qps == 0
    kernel = functools.partial(_dense_multi_kernel, qps=qps)
    g = b // qps

    def vec_spec(j):
        return pl.BlockSpec(
            (1, pad, dim),
            lambda gi, p, L, j=j: (L[gi * qps + j, p], 0, 0),
        )

    def aux_spec(j):
        return pl.BlockSpec(
            (1, 1, pad), lambda gi, p, L, j=j: (L[gi * qps + j, p], 0, 0)
        )

    def out_spec(j):
        return pl.BlockSpec(
            (1, 1, pad),
            lambda gi, p, L, j=j: ((gi * qps + j) * nprobe + p, 0, 0),
        )

    in_specs = [pl.BlockSpec((b, dim), lambda gi, p, L: (0, 0))]
    for j in range(qps):
        in_specs += [vec_spec(j), aux_spec(j), aux_spec(j)]
    out_specs = []
    for j in range(qps):
        out_specs += [out_spec(j), out_spec(j)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nprobe),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    shapes = []
    for _ in range(qps):
        shapes += [
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.float32),
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.int32),
        ]
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, queries, list_vecs, list_sqn, list_ids):
        sqn3 = list_sqn.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = []
        for _ in range(qps):
            args += [list_vecs, sqn3, ids3]
        outs = call(lists, queries, *args)
        # every slot writes the same (b*nprobe, 1, pad) canvas rows that
        # belong to it; slot j's canvas holds rows (i*qps+j)*nprobe+p.
        # Merge by summing the disjoint writes? No — each output array is
        # separate; take slot j's rows from outs[2j].
        d_parts = []
        i_parts = []
        for j in range(qps):
            dj = outs[2 * j].reshape(b, nprobe, pad)[j::qps]
            ij = outs[2 * j + 1].reshape(b, nprobe, pad)[j::qps]
            d_parts.append(dj)
            i_parts.append(ij)
        d_all = jnp.stack(d_parts, axis=1).reshape(b, nprobe * pad)
        i_all = jnp.stack(i_parts, axis=1).reshape(b, nprobe * pad)
        sd, si = jax.lax.sort((d_all, i_all), dimension=1, num_keys=2)
        return sd[:, :k], si[:, :k]

    return run


# --------------------------------------------- 8-slot with d-split accum


def _dense_dsplit_kernel(lists_ref, q_ref, *refs, qps: int, d_half: int):
    vec_refs = refs[0::3][:qps]
    sqn_refs = refs[1::3][:qps]
    ids_refs = refs[2::3][:qps]
    outs = refs[3 * qps :]
    g_idx = pl.program_id(0)
    h_idx = pl.program_id(2)
    for j in range(qps):
        q = q_ref[pl.ds(g_idx * qps + j, 1), pl.ds(h_idx * d_half, d_half)]
        x = vec_refs[j][0]                                 # (pad, d_half)
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        part = jnp.sum(q * q) - 2.0 * ip                   # (1, pad)

        @pl.when(h_idx == 0)
        def _first(j=j, part=part):
            outs[2 * j][0] = part

        @pl.when(h_idx == 1)
        def _second(j=j, part=part):
            ids = ids_refs[j][0]
            dist = jnp.maximum(outs[2 * j][0] + part + sqn_refs[j][0], 0.0)
            outs[2 * j][0] = jnp.where(ids >= 0, dist, jnp.inf)
            outs[2 * j + 1][0] = ids


@functools.lru_cache(maxsize=None)
def dense_dsplit_program(nlist, pad, dim, b, nprobe, k, qps):
    assert b % qps == 0 and dim % 2 == 0
    d_half = dim // 2
    kernel = functools.partial(_dense_dsplit_kernel, qps=qps, d_half=d_half)
    g = b // qps

    def vec_spec(j):
        return pl.BlockSpec(
            (1, pad, d_half),
            lambda gi, p, h, L, j=j: (L[gi * qps + j, p], 0, h),
        )

    def aux_spec(j):
        return pl.BlockSpec(
            (1, 1, pad), lambda gi, p, h, L, j=j: (L[gi * qps + j, p], 0, 0)
        )

    def out_spec(j):
        return pl.BlockSpec(
            (1, 1, pad),
            lambda gi, p, h, L, j=j: ((gi * qps + j) * nprobe + p, 0, 0),
        )

    in_specs = [pl.BlockSpec((b, dim), lambda gi, p, h, L: (0, 0))]
    for j in range(qps):
        in_specs += [vec_spec(j), aux_spec(j), aux_spec(j)]
    out_specs = []
    for j in range(qps):
        out_specs += [out_spec(j), out_spec(j)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nprobe, 2),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    shapes = []
    for _ in range(qps):
        shapes += [
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.float32),
            jax.ShapeDtypeStruct((b * nprobe, 1, pad), jnp.int32),
        ]
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(lists, queries, list_vecs, list_sqn, list_ids):
        sqn3 = list_sqn.reshape(nlist, 1, pad)
        ids3 = list_ids.reshape(nlist, 1, pad)
        args = []
        for _ in range(qps):
            args += [list_vecs, sqn3, ids3]
        outs = call(lists, queries, *args)
        d_parts = []
        i_parts = []
        for j in range(qps):
            d_parts.append(outs[2 * j].reshape(b, nprobe, pad)[j::qps])
            i_parts.append(outs[2 * j + 1].reshape(b, nprobe, pad)[j::qps])
        d_all = jnp.stack(d_parts, axis=1).reshape(b, nprobe * pad)
        i_all = jnp.stack(i_parts, axis=1).reshape(b, nprobe * pad)
        sd, si = jax.lax.sort((d_all, i_all), dimension=1, num_keys=2)
        return sd[:, :k], si[:, :k]

    return run


# ---------------------------------------------------------------- harness


def main():
    K = 10
    key = jax.random.PRNGKey(0)
    lv = jax.random.normal(key, (NLIST, PAD, D), jnp.float32)
    li = np.arange(NLIST * PAD, dtype=np.int32).reshape(NLIST, PAD)
    li[:, -8:] = -1
    li = jnp.asarray(li)
    ln = jnp.sum(lv * lv, axis=-1)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    lists = jax.random.randint(
        jax.random.PRNGKey(2), (B, NPROBE), 0, NLIST, jnp.int32
    )

    progs = {
        "v0_dense": ivf_scan_program_dense(
            NLIST, PAD, D, B, NPROBE, K, exact=True
        ),
        "multi_q2": dense_multi_program(NLIST, PAD, D, B, NPROBE, K, 2),
        "multi_q4": dense_multi_program(NLIST, PAD, D, B, NPROBE, K, 4),
        "dsplit_q8": dense_dsplit_program(NLIST, PAD, D, B, NPROBE, K, 8),
    }

    ref_d = ref_i = None
    results = {}
    for name, prog in progs.items():
        try:
            t0 = time.perf_counter()
            d, i = prog(lists, q, lv, ln, li)
            jax.block_until_ready((d, i))
            ct = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        d, i = np.asarray(d), np.asarray(i)
        if ref_d is None:
            ref_d, ref_i = d, i
            ok = "ref"
        else:
            ok = (
                "ids==" if (i == ref_i).all()
                else f"IDS DIFFER ({np.mean(i != ref_i):.3f})"
            )

        @jax.jit
        def chain(mk, _q, *ops):
            def body(s, _):
                dd, _ = prog(ops[0], _q + s * 0.0, *ops[1:])
                return s + dd[0, 0] * 0.0 + 1.0, None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=mk.shape[0])
            return s

        def timed(steps):
            mk = jnp.zeros((steps,))
            float(chain(mk, q, lists, lv, ln, li))
            t0 = time.perf_counter()
            float(chain(mk, q, lists, lv, ln, li))
            return time.perf_counter() - t0

        lo, hi = 2, 10
        t_lo = timed(lo)
        while True:
            t_hi = timed(hi)
            if t_hi > 1.5 * t_lo or hi >= 320:
                break
            hi *= 4
        per_batch = (t_hi - t_lo) / (hi - lo)
        qps = B / per_batch
        results[name] = qps
        print(f"{name}: {qps:,.0f} QPS ({ok}; compile {ct:.1f}s)", flush=True)
    if "v0_dense" in results:
        for name, v in results.items():
            if name != "v0_dense":
                print(f"{name}: {v / results['v0_dense']:.2f}x vs v0")


if __name__ == "__main__":
    main()
