"""Decompose the B=1024 exact-path cost at 1M x 768.

bench.py's B=1024 composite (kernel k=20 + rerank) measured 46.8k QPS vs
the round-1 raw-kernel (k=10) figure of ~91k. Which part regressed:
the deeper kernel k, the rerank, or neither (variance)?
"""

from __future__ import annotations

import time

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

from c99_vectordb_tpu.ops.rerank import rerank_program
from c99_vectordb_tpu.ops.topk_pallas import fused_topk

N, D, B, K, KS = 1_048_576, 768, 1024, 10, 20


def timed_qps(step, ops, iters=4):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = jax.random.normal(jax.random.key(7), (steps, B, D), jnp.float32)
        float(chain(qstack, *ops))
        t0 = time.perf_counter()
        float(chain(qstack, *ops))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if t_hi > 1.5 * t_lo or hi >= 128:
            break
        hi *= 4
    return B * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    db = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    ids = jnp.arange(N, dtype=jnp.int32)
    db16 = db.astype(jnp.bfloat16)
    float(jnp.sum(sq))

    def raw10(q, db, ids, sq):
        return fused_topk(db, ids, sq, q, K)

    def raw20(q, db, ids, sq):
        return fused_topk(db, ids, sq, q, KS)

    def comp(q, db, ids, sq):
        _, ci = fused_topk(db, ids, sq, q, KS)
        return rerank_program(N, D, N, B, KS, K, "float32")(db, ids, ci, q)

    def comp16(q, db16, db, ids, sq):
        _, ci = fused_topk(db16, ids, sq, q, KS)
        return rerank_program(N, D, N, B, KS, K, "float32")(db, ids, ci, q)

    def raw_tiled(tb, tn):
        def fn(q, db, ids, sq):
            return fused_topk(db, ids, sq, q, K, tile_b=tb, tile_n=tn)

        return fn

    for name, fn, ops in [
        ("raw k=10 f32", raw10, (db, ids, sq)),
        ("raw k=20 f32", raw20, (db, ids, sq)),
        ("k=20 + rerank", comp, (db, ids, sq)),
        ("bf16 scan + rerank", comp16, (db16, db, ids, sq)),
        ("raw k=10 bf16", raw10, (db16, ids, sq)),
        ("raw tb=256 tn=1024", raw_tiled(256, 1024), (db, ids, sq)),
        ("raw tb=512 tn=1024", raw_tiled(512, 1024), (db, ids, sq)),
        # bigger tiles exceed the 16MB scoped-vmem limit (measured)
    ]:
        qps = timed_qps(fn, ops)
        print(f"{name:<20} {qps:>10,.0f} QPS  ({B * 1e6 / qps / 1000:.2f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
