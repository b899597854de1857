"""Sharded FLAT routes on a 1-device mesh at 1M x 768: XLA local scan
vs fused-kernel local scan (f32 and SQ8), same process.

Quantifies the round-3 claim that the per-shard XLA matmul + lax.top_k
local function (which materializes the (B, n_local) score matrix in
HBM) loses to the fused Pallas kernel + per-shard exact rerank, and
measures the int8 variant's additional lift.

Usage: python benchmarks/exp_sharded_flat_1chip.py   (TPU, ~10 min)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from c99_vectordb_tpu.parallel.mesh import make_mesh
from c99_vectordb_tpu.parallel.sharded import (
    sharded_search_kernels,
    sharded_search_program,
    sharded_search_sq8_kernels,
)

N, D, K, B = 1_048_576, 768, 10, 128


def timed_qps(step, ops, b, iters=6):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = jax.random.normal(
            jax.random.key(7), (steps, b, D), jnp.float32
        )
        float(chain(qstack, *ops))
        t0 = time.perf_counter()
        float(chain(qstack, *ops))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if t_hi > 1.5 * t_lo or hi >= 256:
            break
        hi *= 4
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])

    def sh(x, spec):
        return jax.device_put(x, NamedSharding(mesh1, spec))

    db = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    ids = jnp.arange(N, dtype=jnp.int32)
    sq = jnp.sum(db * db, axis=1)
    scale = jnp.maximum(jnp.max(jnp.abs(db), axis=0), 1e-30) / 127.0
    codes = jnp.clip(jnp.rint(db / scale), -127, 127).astype(jnp.int8)
    dec = codes.astype(jnp.float32) * scale
    dec_sq = jnp.sum(dec * dec, axis=1)
    db_s = sh(db, P("data", None))
    ids_s = sh(ids, P("data"))
    sq_s = sh(sq, P("data"))
    codes_s = sh(codes, P("data", None))
    dec_sq_s = sh(dec_sq, P("data"))
    scale_s = sh(scale, P(None))
    q0 = sh(jnp.zeros((B, D), jnp.float32), P(None, None))
    del db, codes, dec

    ks = 20
    xla_prog = sharded_search_program(mesh1, N, D, B, K)
    ker_prog = sharded_search_kernels(mesh1, N, D, B, K, ks)
    sq8_prog = sharded_search_sq8_kernels(mesh1, N, D, B, K, ks)

    def xla_step(q, db, ids, sq):
        return xla_prog(db, ids, sq, q)

    def ker_step(q, db, ids, sq):
        return ker_prog(db, ids, sq, q)

    def sq8_step(q, codes, db, ids, dsq, scale):
        return sq8_prog(codes, db, ids, dsq, scale, q)

    for name, step, ops in [
        ("xla_local_scan", xla_step, (db_s, ids_s, sq_s)),
        ("fused_kernel_f32", ker_step, (db_s, ids_s, sq_s)),
        ("fused_kernel_sq8", sq8_step,
         (codes_s, db_s, ids_s, dec_sq_s, scale_s)),
    ]:
        qps = timed_qps(step, ops, B)
        print(f"{name}: {qps:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
