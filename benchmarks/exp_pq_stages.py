"""Refined-PQ composite stage attribution at 1M x 768 (post-hi/lo).

Breaks the refined path into cumulative stages to locate the next
bottleneck now that the ADC kernel itself is 3.55x faster:
  A  coarse ranking (centroid matmul + top_k)
  B  A + dense ADC scan (Pallas hi/lo kernel, dense output)
  C  B + shortlist selection (approx_min_k to k_adc)
  D  C + exact f32 rerank to k (the full product path)

Usage: python benchmarks/exp_pq_stages.py   (TPU, ~10 min)
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

from c99_vectordb_tpu.models.base import list_pad, next_pow2
from c99_vectordb_tpu.ops.adc_pallas import (
    CODE_LANES,
    adc_dense_program,
    adc_dense_search_program,
    build_item_constants,
)
from c99_vectordb_tpu.ops.kmeans import (
    assign_clusters, assign_clusters_multi, train_kmeans, train_kmeans_multi,
)
from c99_vectordb_tpu.ops.rerank import exact_rerank_staged

N, D, K, B, M, KSUB = 1_048_576, 768, 10, 128, 96, 256
NLIST, NPROBE, K_ADC = 4096, 1, 200
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_per_batch(step, ops, iters=10):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out = step(q + s * 0.0, *ops)
            lead = out[0] if isinstance(out, tuple) else out
            return s + lead.reshape(-1)[0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = gen(jnp.zeros((steps * B,)), 7).reshape(steps, B, D)
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
    return (t_hi - t_lo) / (hi - lo)


def main():
    db = gen(jnp.zeros((N,)), 0)
    centroids = train_kmeans(db, NLIST, iters=8, out_device=True)
    assign_d = assign_clusters(db, centroids, out_device=True)
    assign = np.asarray(assign_d)
    c_sq = jnp.sum(centroids * centroids, axis=1)

    # residual PQ train + encode, on device where possible
    dsub = D // M
    t0 = time.perf_counter()
    residuals = db - centroids[assign_d]
    subs = jnp.transpose(residuals.reshape(N, M, dsub), (1, 0, 2))
    books = train_kmeans_multi(subs, KSUB, iters=6, seed=1, out_device=True)
    codes = assign_clusters_multi(subs, books, out_device=True)  # (M, N)
    codes = np.asarray(codes.T).astype(np.uint8)
    del residuals, subs
    print(f"pq train+encode {time.perf_counter() - t0:.1f}s", flush=True)

    counts = np.bincount(assign, minlength=NLIST)
    pad = list_pad(int(counts.max(initial=1)))
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    starts = np.zeros((NLIST,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(N) - starts[sorted_lists]).astype(np.int32)

    @jax.jit
    def scatter_codes(codes_dev, order, lists, slots):
        c128 = jnp.zeros((NLIST, CODE_LANES, pad), jnp.uint8)
        c128 = c128.at[lists, :M, slots].set(codes_dev[order])
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(order)
        return c128, li

    codes128, li = scatter_codes(
        jnp.asarray(codes), jnp.asarray(order), jnp.asarray(sorted_lists),
        jnp.asarray(slots),
    )
    item_const = jnp.asarray(build_item_constants(
        np.asarray(centroids), assign, codes, np.asarray(books),
        order, sorted_lists, slots, NLIST, pad,
    ))
    print(f"staged pad={pad}", flush=True)

    # rerank store: the raw db flat + iota id lookup
    @jax.jit
    def scatter_vecs(_db, order, lists, slots):
        return jnp.zeros((NLIST, pad, D), jnp.float32).at[lists, slots].set(
            _db[order]
        )

    lv = scatter_vecs(db, jnp.asarray(order), jnp.asarray(sorted_lists),
                      jnp.asarray(slots))
    bucket_row = np.zeros((N,), np.int32)
    bucket_row[order] = (sorted_lists.astype(np.int64) * pad + slots).astype(
        np.int32
    )
    cap = next_pow2(N)
    table = np.zeros((cap,), np.int32)
    table[:N] = bucket_row
    table_d = jnp.asarray(table)
    del db

    books_d = jnp.asarray(books, dtype=jnp.float32)
    dense_scan = adc_dense_program(NLIST, pad, M, KSUB, B, NPROBE)
    search_prog = adc_dense_search_program(
        NLIST, pad, D, M, KSUB, B, NPROBE, K_ADC
    )

    def stage_a(q, c, csq):
        coarse = (
            jnp.sum(q * q, axis=1, keepdims=True)
            + csq[None, :]
            - 2.0 * jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        neg, probes = jax.lax.top_k(-coarse, NPROBE)
        return probes.astype(jnp.float32)

    def stage_b(q, c, csq, books, c128, const, ids):
        coarse = (
            jnp.sum(q * q, axis=1, keepdims=True)
            + csq[None, :]
            - 2.0 * jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        neg, probes = jax.lax.top_k(-coarse, NPROBE)
        pc = jnp.maximum(-neg, 0.0)
        q_sub = q.reshape(B, M, dsub)
        qd = jnp.einsum("bjd,jcd->bjc", q_sub, books,
                        preferred_element_type=jnp.float32)
        qd = jnp.pad(qd, ((0, 0), (0, CODE_LANES - M), (0, 0)))
        d, i = dense_scan(probes.astype(jnp.int32), pc, qd, c128, const, ids)
        return d

    def stage_c(q, c, csq, books, c128, const, ids):
        d, i = search_prog(c, csq, books, c128, const, ids, q)
        return d

    def stage_d(q, c, csq, books, c128, const, ids, _lv, _table):
        _, si = search_prog(c, csq, books, c128, const, ids, q)
        return exact_rerank_staged(
            _lv.reshape(-1, D), ("dense", _table), si.astype(jnp.int32), q, K
        )

    ops_b = (centroids, c_sq, books_d, codes128, item_const, li)
    rows = {
        "A_coarse": ((centroids, c_sq), stage_a),
        "B_+dense_scan": (ops_b, stage_b),
        "C_+shortlist": (ops_b, stage_c),
        "D_+rerank(full)": (ops_b + (lv, table_d), stage_d),
    }
    prev = 0.0
    for name, (ops, step) in rows.items():
        t = timed_per_batch(step, ops)
        print(
            f"{name}: {t * 1e6:,.0f} us/batch (+{(t - prev) * 1e6:,.0f}) "
            f"=> {B / t:,.0f} QPS",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
