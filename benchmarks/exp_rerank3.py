"""A/B the run.py ivf+rerank measurement against the exp_rerank2 one.

Same process, same staging as run.py (kmeans 8 iters, db retained),
measuring the composed p=1 path four ways:
  inline      rerank body inlined in the step (exp_rerank2 style)
  jitcall     rerank via the separately-jitted rerank_program (run.py style)
  after_flat  jitcall, but AFTER running a flat-kernel chain first
              (mimics run.py's program history)
  raw         scan only
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
from c99_vectordb_tpu.ops.rerank import rerank_program
from c99_vectordb_tpu.ops.topk import merge_topk
from c99_vectordb_tpu.ops.topk_pallas import fused_topk

N, D, B, K, NLIST, NPROBE, KS = 1_048_576, 768, 128, 10, 4096, 1, 20


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
    sq = jnp.sum(db * db, axis=1)
    ids_dev = jnp.arange(N, dtype=jnp.int32)
    centroids_d = train_kmeans(db, NLIST, iters=8, out_device=True)
    assign = np.asarray(assign_clusters(db, centroids_d, out_device=True))
    counts = np.bincount(assign, minlength=NLIST)
    pad = next_pow2(max(int(counts.max(initial=1)), 8))
    print(f"pad={pad}", flush=True)
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    starts = np.zeros((NLIST,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(N) - starts[sorted_lists]).astype(np.int32)

    @jax.jit
    def scatter(db, ids, order, lists, slots):
        lv = jnp.zeros((NLIST, pad, D), jnp.float32).at[lists, slots].set(db[order])
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(ids[order])
        return lv, li, jnp.sum(lv * lv, axis=-1)

    lv, li, lsq = scatter(
        db, ids_dev, jnp.asarray(order), jnp.asarray(sorted_lists), jnp.asarray(slots)
    )
    float(jnp.sum(lsq[0]))
    row_of_id = np.zeros((N,), np.int32)
    row_of_id[order] = (sorted_lists.astype(np.int64) * pad + slots).astype(np.int32)
    rop = jnp.asarray(row_of_id)
    csq = jnp.sum(centroids_d * centroids_d, axis=1)

    scan10 = ivf_full_search_program(NLIST, pad, D, B, NPROBE, K)
    scan20 = ivf_full_search_program(NLIST, pad, D, B, NPROBE, KS)
    rr_p = rerank_program(NLIST * pad, D, N, B, KS, K, "float32")

    def raw(q, cents, csq, lv, lsq, li, rop):
        return scan10(cents, csq, lv, lsq, li, q)

    def inline(q, cents, csq, lv, lsq, li, rop):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        rows = rop[jnp.clip(jnp.maximum(ci, 0), 0, N - 1)]
        vecs = lv.reshape(NLIST * pad, D)[rows]
        diff = vecs - q[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
        exact = jnp.where(ci >= 0, exact, jnp.inf)
        return merge_topk(exact, ci, K)

    def jitcall(q, cents, csq, lv, lsq, li, rop):
        _, ci = scan20(cents, csq, lv, lsq, li, q)
        return rr_p(lv.reshape(NLIST * pad, D), rop, ci, q)

    ops = (centroids_d, csq, lv, lsq, li, rop)
    print(f"raw      {timed_qps(raw, ops):>12,.0f} QPS", flush=True)
    print(f"inline   {timed_qps(inline, ops):>12,.0f} QPS", flush=True)
    print(f"jitcall  {timed_qps(jitcall, ops):>12,.0f} QPS", flush=True)

    # program-history effect: run a flat-kernel chain, then remeasure
    def flat_step(q, db, ids, sq):
        _, ci = fused_topk(db, ids, sq, q, KS)
        return rerank_program(N, D, N, B, KS, K, "float32")(db, ids, ci, q)

    print(f"flat     {timed_qps(flat_step, (db, ids_dev, sq)):>12,.0f} QPS", flush=True)
    print(f"jitcall2 {timed_qps(jitcall, ops):>12,.0f} QPS", flush=True)
    print(f"raw2     {timed_qps(raw, ops):>12,.0f} QPS", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
