"""SQ8 inverted lists at 1M x 768: int8 dense scan + exact f32 rerank.

The f32 dense exact scan is DMA-bound at ~1.7us/query/probe (1.18 MB
list block); SQ8 lists cut that 4x AND run the double-rate int8 MXU, at
the cost of a rerank stage. Measures both against the same
Precision.HIGHEST ground truth, same process.
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
from c99_vectordb_tpu.ops.ivf_scan_pallas import (
    ivf_full_search_program, ivf_sq8_search_program,
)
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.ops.rerank import exact_rerank_rows, shortlist_depth

import os

N, D, K, B = 1_048_576, 768, 10, 128
NLIST = int(os.environ.get("EXP_NLIST", "4096"))
NCLUST = 4096


UNIFORM = "--uniform" in sys.argv  # no cluster structure: the honest
# recall/QPS tradeoff (clustered corpora make p=1 capture ~everything)


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    if UNIFORM:
        return jax.random.normal(kn, (marker.shape[0], D), jnp.float32)
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_qps(step, ops, b, iters=6):
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
        if t_hi > 1.5 * t_lo or hi >= 256:
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
        lv = jnp.zeros((NLIST, pad, D), jnp.float32).at[lists, slots].set(_db[order])
        ln = jnp.full((NLIST, pad), jnp.inf, jnp.float32).at[lists, slots].set(
            _sq[order]
        )
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(order)
        return lv, ln, li

    o_dev = jnp.asarray(order)
    lv, ln, li = scatter(db, sq, o_dev, jnp.asarray(sorted_lists), jnp.asarray(slots))
    print(f"staged pad={pad}", flush=True)

    # SQ8 staging, on device — the PRODUCT quantizer (models/ivf_flat.py)
    from c99_vectordb_tpu.models.ivf_flat import _sq8_stage

    codes, dim_scale, dec_sqn = _sq8_stage(lv, li)
    float(jnp.sum(dim_scale))

    eval_q = gen(jnp.zeros((B,)), 9)

    @jax.jit
    def gt_scan(_db, _sq, q):
        q_sq = jnp.sum(q * q, axis=1)
        chunks = _db.reshape(N // 2048, 2048, D)
        sq_chunks = _sq.reshape(N // 2048, 2048)

        def step(carry, inp):
            best_d, best_i = carry
            block, block_sq, idx = inp
            ip = jax.lax.dot_general(
                q, block.T, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            dist = block_sq[None, :] - 2.0 * ip + q_sq[:, None]
            bids = idx * 2048 + jnp.arange(2048, dtype=jnp.int32)
            alld = jnp.concatenate([best_d, dist], axis=1)
            alli = jnp.concatenate(
                [best_i, jnp.broadcast_to(bids, (B, 2048))], axis=1
            )
            neg, pos = jax.lax.top_k(-alld, K)
            return (-neg, jnp.take_along_axis(alli, pos, axis=1)), None

        init = (jnp.full((B, K), jnp.inf, jnp.float32),
                jnp.full((B, K), -1, jnp.int32))
        (bd, bi), _ = jax.lax.scan(
            step, init,
            (chunks, sq_chunks, jnp.arange(N // 2048, dtype=jnp.int32)),
        )
        return bd, bi

    _, gt_i = gt_scan(db, sq, eval_q)
    gt_i = np.asarray(gt_i)
    del db, sq

    def rec(ai):
        return sum(
            len(set(ai[q].tolist()) & set(gt_i[q].tolist())) for q in range(B)
        ) / gt_i.size

    ks = shortlist_depth(K, N)

    for p in (1, 4, 16, 64) if UNIFORM else (1, 4, 16):
        exact_prog = ivf_full_search_program(
            NLIST, pad, D, B, p, K, exact=True, dense=p * pad <= 4096
        )
        sq8_prog = ivf_sq8_search_program(NLIST, pad, D, B, p, ks)

        def exact_step(q, c, csq, _lv, _ln, _li, *rest):
            return exact_prog(c, csq, _lv, _ln, _li, q)

        ops_e = (centroids, c_sq, lv, ln, li)
        ops_q = ops_e + (codes, dim_scale, dec_sqn)

        def sq8_step_l(q, c, csq, _lv, _ln, _li, _codes, _scale, _dsq):
            # rows-mode rerank: the scan emits bucket-store rows, no
            # id->row table gather (ops/rerank.rerank_program_rows)
            _, si, srows = sq8_prog(c, csq, _codes, _scale, _dsq, _li, q)
            return exact_rerank_rows(_lv.reshape(-1, D), srows, si, q, K)

        _, ei = jax.jit(exact_step)(eval_q, *ops_e)
        _, qi = jax.jit(sq8_step_l)(eval_q, *ops_q)
        r_e, r_q = rec(np.asarray(ei)), rec(np.asarray(qi))
        qps_e = timed_qps(exact_step, ops_e, B)
        qps_q = timed_qps(sq8_step_l, ops_q, B)
        print(
            f"p={p}: f32-exact {qps_e:,.0f} QPS recall={r_e:.4f} | "
            f"sq8+rr {qps_q:,.0f} QPS recall={r_q:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
