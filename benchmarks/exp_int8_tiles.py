"""Tile-shape sweep for the int8-MXU flat scan at 1M x 768.

The int8 matmul floor at B=1024 is ~5.8 ms/scan (exp_int8_mxu.py) =
~178k QPS, but the composite measures ~93k. Sweeps (tile_n, tile_b) for
the SQ8 fused kernel (both operands int8) at B=128 and B=1024 — n is
padded to 2048 multiples here so tile_n=2048 is legal (bench.py's
1024-multiple padding silently forbids it).
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
        qstack = jax.random.normal(
            jax.random.key(7), (steps, b, D), dtype=jnp.float32
        )
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
    ids = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def stage(_db):
        scale = jnp.max(jnp.abs(_db), axis=0) / 127.0
        codes = jnp.clip(jnp.round(_db / scale), -127, 127).astype(jnp.int8)
        dec_sq = jnp.sum((codes.astype(jnp.float32) * scale) ** 2, axis=1)
        return scale, codes, dec_sq

    scale, codes, dec_sq = stage(db)
    float(jnp.sum(dec_sq))
    ks = shortlist_depth(K, N)

    for b in (128, 1024):
        for tile_n in (1024, 2048, 4096):
            for tile_b in (256, 512):
                if tile_b > b:
                    continue
                # VMEM: db block tile_n*768 int8 (+bf16? int8 stays int8)
                # double-buffered + q block b*768 int8 + scratch
                def step(q, _codes, _scale, _db, _ids, _dsq,
                         _tn=tile_n, _tb=tile_b):
                    _, ci = fused_topk(_codes, _ids, _dsq, q * _scale, ks,
                                       tile_n=_tn, tile_b=_tb)
                    return rerank_program(N, D, N, b, ks, K, "float32")(
                        _db, _ids, ci, q
                    )

                ops = (codes, scale, db, ids, dec_sq)
                try:
                    qps = timed_qps(step, ops, b)
                    print(f"B={b} tile_n={tile_n} tile_b={tile_b}: "
                          f"{qps:>9,.0f} QPS", flush=True)
                except Exception as e:
                    print(f"B={b} tile_n={tile_n} tile_b={tile_b}: "
                          f"FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
