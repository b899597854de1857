"""bf16 inverted lists: dense-vs-select crossover at 1M x 768.

The scan-width gate in models/ivf_flat.py uses the f32-measured
threshold (~4096 candidates/query); bf16 lists halve the DMA so the
sort/selection cost crosses over at a different width. Measures both
variants at p = 8 / 11 / 16 (widths 3072 / 4224 / 6144 at pad=384).
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

from c99_vectordb_tpu.models.base import list_pad
from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_full_search_program
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans

N, D, K, B, NLIST = 1_048_576, 768, 10, 128, 4096
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_qps(step, ops, b, iters=4):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = gen(jnp.zeros((steps * b,)), 7).reshape(steps, b, D)
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
    db = gen(jnp.zeros((N,)), 0)
    sq = jnp.sum(db * db, axis=1)
    float(jnp.sum(sq))
    centroids = train_kmeans(db, NLIST, iters=8, out_device=True)
    assign = np.asarray(assign_clusters(db, centroids, out_device=True))
    c_sq = jnp.sum(centroids * centroids, axis=1)
    counts = np.bincount(assign, minlength=NLIST)
    pad = list_pad(int(counts.max(initial=1)))
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    starts = np.zeros((NLIST,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(N) - starts[sorted_lists]).astype(np.int32)

    @jax.jit
    def scatter(_db, _sq, order, lists, slots):
        lv = jnp.zeros((NLIST, pad, D), jnp.bfloat16).at[lists, slots].set(
            _db[order].astype(jnp.bfloat16)
        )
        ln = jnp.full((NLIST, pad), jnp.inf, jnp.float32).at[lists, slots].set(
            _sq[order]
        )
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(order)
        return lv, ln, li

    lv16, ln, li = scatter(db, sq, jnp.asarray(order),
                           jnp.asarray(sorted_lists), jnp.asarray(slots))
    del db, sq
    print(f"staged pad={pad} (bf16 lists)", flush=True)

    for p in (8, 11, 16):
        for dense in (True, False):
            prog = ivf_full_search_program(
                NLIST, pad, D, B, p, K, db_dtype=jnp.bfloat16, dense=dense
            )

            def step(q, c, csq, _lv, _ln, _li, _p=prog):
                return _p(c, csq, _lv, _ln, _li, q)

            ops = (centroids, c_sq, lv16, ln, li)
            qps = timed_qps(step, ops, B)
            print(f"p={p:<3d} width={p * pad:<6d} "
                  f"{'dense ' if dense else 'select'}: {qps:>9,.0f} QPS",
                  flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
