"""Decompose the fused flat kernel's B=1024 cost: scan floor vs selection.

sel_mode "none" disables insertion rounds entirely (wrong results — pure
scan+count floor), "full" always runs k rounds (no adaptivity), "adaptive"
is the product path. The gap adaptive-vs-none is the selection budget a
smarter scheme could reclaim.
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

from c99_vectordb_tpu.ops.topk_pallas import fused_topk

N, D, B = 1_048_576, 768, 1024


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

    def raw(k, mode, tb):
        def fn(q, store, ids, sq):
            return fused_topk(store, ids, sq, q, k, tile_b=tb,
                              max_resident_b=4096, _sel_mode=mode)

        return fn

    for name, fn, store in [
        ("f32 k=10 adaptive tb=256", raw(10, "adaptive", 256), db),
        ("f32 k=10 NONE     tb=256", raw(10, "none", 256), db),
        ("f32 k=10 FULL     tb=256", raw(10, "full", 256), db),
        ("f32 k=20 adaptive tb=256", raw(20, "adaptive", 256), db),
        ("f32 k=10 adaptive tb=128", raw(10, "adaptive", 128), db),
        ("f32 k=10 NONE     tb=1024", raw(10, "none", 1024), db),
        ("bf16 k=10 NONE    tb=256", raw(10, "none", 256), db16),
        ("bf16 k=10 adaptive tb=256", raw(10, "adaptive", 256), db16),
    ]:
        try:
            qps = timed_qps(fn, (store, ids, sq), B)
            print(f"{name:<28} {qps:>10,.0f} QPS  ({B * 1e6 / qps / 1000:.2f} ms/batch)",
                  flush=True)
        except Exception as e:
            print(f"{name:<28} FAILED: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
