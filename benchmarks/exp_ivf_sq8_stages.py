"""Stage attribution for the SQ8-IVF composite at 1M x 768, p=1.

Times nested prefixes of the pipeline (coarse | +scan | +top_k |
+rerank) in one process; differences attribute the ~0.17 ms/batch gap
between the measured composite (~734k-1.3M QPS) and the list-DMA
ceiling (~2.4M at p=1)."""

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
    ivf_scan_program_dense_int8,
)
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.ops.rerank import (
    build_id_lookup, exact_rerank_rows, exact_rerank_staged, shortlist_depth,
)

N, D, K, B, NLIST, P = 1_048_576, 768, 10, 128, 4096, 1
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_us(step, ops, iters=6):
    """us per BATCH of B queries."""

    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out = step(q + s * 0.0, *ops)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return s + leaf.reshape(-1)[0].astype(jnp.float32) * 0.0 + 1.0, None

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
    return (t_hi - t_lo) / (hi - lo) * 1e6


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
    def scatter(_db, order, lists, slots):
        lv = jnp.zeros((NLIST, pad, D), jnp.float32).at[lists, slots].set(_db[order])
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(order)
        return lv, li

    lv, li = scatter(db, jnp.asarray(order), jnp.asarray(sorted_lists),
                     jnp.asarray(slots))
    del db, sq

    from c99_vectordb_tpu.models.ivf_flat import _sq8_stage  # the product quantizer

    codes, dim_scale, dec_sqn = _sq8_stage(lv, li)
    float(jnp.sum(dim_scale))
    bucket_row = np.zeros((N,), np.int32)
    bucket_row[order] = (sorted_lists.astype(np.int64) * pad + slots).astype(
        np.int32
    )
    lookup = build_id_lookup(np.arange(N, dtype=np.int64), bucket_row)
    ks = shortlist_depth(K, N)
    scan = ivf_scan_program_dense_int8(NLIST, pad, D, B, P, ks, 8)
    scan_raw = ivf_scan_program_dense_int8(NLIST, pad, D, B, P, ks, 1)

    def coarse_probes(q, cents, csq):
        coarse = csq[None, :] - 2.0 * jnp.dot(
            q, cents.T, preferred_element_type=jnp.float32
        )
        _, probes = jax.lax.top_k(-coarse, P)
        return probes.astype(jnp.int32)

    def quantize(q, scale):
        qs = q * scale * -2.0
        rs = jnp.maximum(jnp.max(jnp.abs(qs), axis=1, keepdims=True), 1e-30) / 127.0
        qi = jnp.clip(jnp.rint(qs / rs), -127, 127).astype(jnp.int8)
        return qi, rs

    def s_coarse(q, cents, csq, *rest):
        return coarse_probes(q, cents, csq)

    def s_scan(q, cents, csq, _codes, _scale, _dsq, _li, *rest):
        probes = coarse_probes(q, cents, csq)
        qi, rs = quantize(q, _scale)
        return scan(probes, qi, rs, _codes, _dsq, _li)

    def s_scan1(q, cents, csq, _codes, _scale, _dsq, _li, *rest):
        probes = coarse_probes(q, cents, csq)
        qi, rs = quantize(q, _scale)
        return scan_raw(probes, qi, rs, _codes, _dsq, _li)

    def s_full(q, cents, csq, _codes, _scale, _dsq, _li, _lv, _rowid):
        probes = coarse_probes(q, cents, csq)
        qi, rs = quantize(q, _scale)
        _, si, srows = scan(probes, qi, rs, _codes, _dsq, _li)
        del _rowid  # rows come from the scan now (rows-mode rerank)
        return exact_rerank_rows(_lv.reshape(-1, D), srows, si, q, K)

    ops = (centroids, c_sq, codes, dim_scale, dec_sqn, li, lv, lookup[1])
    for name, fn in (
        ("coarse+topk", s_coarse),
        ("+scan8+topk", s_scan),
        ("+scan1+topk", s_scan1),
        ("full(+rerank)", s_full),
    ):
        us = timed_us(fn, ops)
        print(f"{name:<14} {us:8.1f} us/batch  ({B / us * 1e6:,.0f} QPS)",
              flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
