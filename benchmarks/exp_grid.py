"""Grid-shape sweep for the fused flat kernel after the epilogue slimming.

Round-2 finding: large-batch cost is per-grid-step bound, so fewer/bigger
steps win. This sweep measures (tile_b, tile_n, store dtype) at B=1024 and
B=128 on the real TPU:
  - tile_b up to the whole resident batch (VMEM is invariant in tile_b —
    the query block is the full batch either way);
  - tile_n=2048 for bf16 stores (the f32 tile at 2048 exceeds the 16MB
    scoped-VMEM limit; bf16 halves it);
  - the -2-prefolded, publish-once kernel (ops/topk_pallas.py).
Composite rows include the exact f32 rerank (the product path).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

from c99_vectordb_tpu.ops.rerank import rerank_program, shortlist_depth
from c99_vectordb_tpu.ops.topk_pallas import fused_topk

N, D, K = 1_048_576, 768, 10


def timed_qps(step, ops, b, iters=4):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = jax.random.normal(jax.random.key(7), (steps, b, D), jnp.float32)
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
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    db = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    ids = jnp.arange(N, dtype=jnp.int32)
    db16 = db.astype(jnp.bfloat16)
    float(jnp.sum(sq))
    ks = shortlist_depth(K, N)

    def raw(store, tb, tn):
        def fn(q, store, db, ids, sq):
            return fused_topk(store, ids, sq, q, K, tile_b=tb, tile_n=tn,
                              max_resident_b=4096)

        return fn

    def comp(store, tb, tn):
        def fn(q, store, db, ids, sq):
            _, ci = fused_topk(store, ids, sq, q, ks, tile_b=tb, tile_n=tn,
                               max_resident_b=4096)
            b = q.shape[0]
            return rerank_program(N, D, N, b, ks, K, "float32")(db, ids, ci, q)

        return fn

    cases = []
    for b in (1024, 128):
        for tb, tn in ((256, 1024), (512, 1024), (1024, 1024)):
            cases.append((f"B={b} f32 raw tb={tb} tn={tn}", raw(db, tb, tn), db, b))
        for tb, tn in ((256, 1024), (512, 1024), (1024, 1024)):
            cases.append((f"B={b} f32 comp tb={tb} tn={tn}", comp(db, tb, tn), db, b))
        for tb, tn in ((256, 1024), (256, 2048), (512, 2048), (1024, 2048),
                       (1024, 1024)):
            cases.append(
                (f"B={b} bf16 comp tb={tb} tn={tn}", comp(db16, tb, tn), db16, b)
            )

    for name, fn, store, b in cases:
        try:
            qps = timed_qps(fn, (store, db, ids, sq), b)
            print(f"{name:<32} {qps:>10,.0f} QPS  ({b * 1e6 / qps / 1000:.2f} ms/batch)",
                  flush=True)
        except Exception as e:  # VMEM-limit rejections etc.
            print(f"{name:<32} FAILED: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
