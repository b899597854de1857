"""Variants of the COMPOSED ivf_flat p=1 + rerank path at 1M x 768.

exp_rerank.py's component timings were unreliable: fixed candidate sets
are loop-invariant, so XLA hoists work out of the timing scan. Here the
candidates always come from the scan kernel per step (the real path), and
only the rerank formulation varies:

  raw        scan kernel only (k=10)
  table      kernel(k=20) + dense-table rerank from lv.reshape(-1, d)
  flatsrc    kernel(k=20) + dense-table rerank from a separate flat copy
  sorted     kernel(k=20) + rerank with candidate ids pre-sorted per row
  nolookup   kernel(k=20) + rerank treating cand as rows directly
             (valid here: ids are iota only for flat; for the bucketed
             store this gives wrong results — timing signal only)
"""

from __future__ import annotations

import time

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

from c99_vectordb_tpu.models.base import next_pow2
from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_full_search_program
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.ops.topk import merge_topk

N, D, B, K, NLIST, NPROBE = 1_048_576, 768, 128, 10, 4096, 1
KS = 20


def gen(key_idx, count):
    @jax.jit
    def _gen(marker):
        kc, kn = jax.random.split(jax.random.key(key_idx))
        centers = jax.random.normal(jax.random.key(1), (4096, D), dtype=jnp.float32)
        cid = jax.random.randint(kc, (marker.shape[0],), 0, 4096)
        return centers[cid] * 3.0 + jax.random.normal(
            kn, (marker.shape[0], D), dtype=jnp.float32
        )

    return _gen(jnp.zeros((count,), jnp.int8))


def timed_qps(step, ops, iters=8):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out = step(q + s * 0.0, *ops)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return s + leaf.reshape(-1)[0].astype(jnp.float32) * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = gen(7, steps * B).reshape(steps, B, D)
        float(chain(qstack, *ops))
        t0 = time.perf_counter()
        float(chain(qstack, *ops))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if t_hi > 1.5 * t_lo or hi >= 512:
            break
        hi *= 4
    return B * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    db = gen(0, N)
    centroids_d = train_kmeans(db, NLIST, iters=4, out_device=True)
    assign = np.asarray(assign_clusters(db, centroids_d, out_device=True))
    counts = np.bincount(assign, minlength=NLIST)
    pad = next_pow2(max(int(counts.max(initial=1)), 8))
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    starts = np.zeros((NLIST,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(N) - starts[sorted_lists]).astype(np.int32)
    order_d, lists_d, slots_d = map(jnp.asarray, (order, sorted_lists, slots))
    ids_dev = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def scatter(db, ids, order, lists, slots):
        lv = jnp.zeros((NLIST, pad, D), jnp.float32).at[lists, slots].set(db[order])
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(ids[order])
        return lv, li, jnp.sum(lv * lv, axis=-1)

    lv, li, lsq = scatter(db, ids_dev, order_d, lists_d, slots_d)
    float(jnp.sum(lsq[0]))
    row_of_id = np.zeros((N,), np.int32)
    row_of_id[order] = (sorted_lists.astype(np.int64) * pad + slots).astype(np.int32)
    rop = jnp.asarray(row_of_id)

    scan10 = ivf_full_search_program(NLIST, pad, D, B, NPROBE, K)
    scan20 = ivf_full_search_program(NLIST, pad, D, B, NPROBE, KS)

    def raw(q, cents, csq, lv, lsq, li, rop, db):
        return scan10(cents, csq, lv, lsq, li, q)

    def _rerank(q, src, rows, ci):
        vecs = src[rows]
        diff = vecs - q[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
        exact = jnp.where(ci >= 0, exact, jnp.inf)
        return merge_topk(exact, ci, K)

    def table(q, cents, csq, lv, lsq, li, rop, db):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        rows = rop[jnp.clip(jnp.maximum(ci, 0), 0, N - 1)]
        return _rerank(q, lv.reshape(NLIST * pad, D), rows, ci)

    def flatsrc(q, cents, csq, lv, lsq, li, rop, db):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        rows = jnp.clip(jnp.maximum(ci, 0), 0, N - 1)
        return _rerank(q, db, rows, ci)

    def sorted_cand(q, cents, csq, lv, lsq, li, rop, db):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        ci = jnp.sort(ci, axis=1)
        rows = rop[jnp.clip(jnp.maximum(ci, 0), 0, N - 1)]
        return _rerank(q, lv.reshape(NLIST * pad, D), rows, ci)

    def nolookup(q, cents, csq, lv, lsq, li, rop, db):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        rows = jnp.clip(jnp.maximum(ci, 0), 0, NLIST * pad - 1)
        return _rerank(q, lv.reshape(NLIST * pad, D), rows, ci)

    ops = (centroids_d, jnp.sum(centroids_d * centroids_d, axis=1), lv, lsq, li, rop, db)
    for name, fn in [
        ("raw k=10", raw),
        ("table", table),
        ("flatsrc", flatsrc),
        ("sorted", sorted_cand),
        ("nolookup", nolookup),
    ]:
        qps = timed_qps(fn, ops)
        print(f"{name:<12} {qps:>12,.0f} QPS ({1e6 / qps:.2f} us/q)", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
