"""Serving-latency characterization: the SQ8-IVF composite vs batch size.

Throughput tables elsewhere fix B=128 (BASELINE.md); a serving deployment
cares about the OTHER axis — what one batch costs end-to-end on device as
B shrinks to interactive sizes. Measures the production composite
(int8 dense scan + shortlist + exact f32 rerank, p=1 and p=4) at
B in {1, 8, 32, 128}: per-batch device latency (us) and the implied QPS,
plus a cross-batch consistency check (row 0 of the B=128 answer ==
the B=1 answer for the same query).

Method: same on-device scan-chain differencing as every other bench
(host timing is untrustworthy on this relay); latency = chain slope per
step, i.e. the steady-state per-batch device cost. Host dispatch adds a
fixed ~sub-ms pipeline cost on top in a live server; that constant is
relay-specific and excluded by design here.
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
from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_sq8_search_program
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.ops.rerank import exact_rerank_rows, shortlist_depth

N, D, K = 1_048_576, 768, 10
NLIST, NCLUST = 4096, 4096
BATCHES = (128, 32, 8, 1)  # descending: B=128 runs first and seeds the
# cross-batch consistency reference
PROBES = (1, 4)
if len(sys.argv) > 1:  # e.g. `exp_latency.py 4 1,8` = probes 4, batches 1,8
    PROBES = tuple(int(x) for x in sys.argv[1].split(","))
if len(sys.argv) > 2:
    BATCHES = tuple(int(x) for x in sys.argv[2].split(","))


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_us_per_batch(step, ops, b, lo=None, hi=None):
    # Small batches need long chains: at B=1 the step is ~15 us, so a
    # 288-step chain is ~4 ms — under this relay's run-to-run noise.
    if lo is None:
        lo = max(32, 2048 // b)
        hi = lo * 9
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
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(qstack, *ops))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo) * 1e6


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
        li = jnp.full((NLIST, pad), -1, jnp.int32).at[lists, slots].set(order)
        return lv, li

    lv, li = scatter(db, sq, jnp.asarray(order), jnp.asarray(sorted_lists),
                     jnp.asarray(slots))
    print(f"staged pad={pad}", flush=True)

    from c99_vectordb_tpu.models.ivf_flat import _sq8_stage

    codes, dim_scale, dec_sqn = _sq8_stage(lv, li)
    float(jnp.sum(dim_scale))

    del db, sq

    ks = shortlist_depth(K, N)
    eval128 = gen(jnp.zeros((128,)), 9)
    ref_ids = {}

    for p in PROBES:
        for b in BATCHES:
            prog = ivf_sq8_search_program(NLIST, pad, D, b, p, ks)

            def step(q, c, csq, _codes, _scale, _dsq, _li, _lv):
                _, si, srows = prog(c, csq, _codes, _scale, _dsq, _li, q)
                return exact_rerank_rows(_lv.reshape(-1, D), srows, si, q, K)

            ops = (centroids, c_sq, codes, dim_scale, dec_sqn, li, lv)
            out_d, out_i = jax.jit(step)(eval128[:b], *ops)
            got = np.asarray(out_i)
            if p in ref_ids:  # compare the overlapping prefix of queries
                m_rows = min(b, ref_ids[p].shape[0])
                np.testing.assert_array_equal(
                    got[:m_rows], ref_ids[p][:m_rows],
                    err_msg=f"B={b} p={p} disagrees with B={ref_ids[p].shape[0]}",
                )
            if p not in ref_ids or b > ref_ids[p].shape[0]:
                ref_ids[p] = got  # largest batch seen seeds the reference
            us = timed_us_per_batch(step, ops, b)
            print(
                f"p={p} B={b:4d}: {us:9.1f} us/batch  "
                f"{us / b:8.1f} us/query  {b / us * 1e6:10,.0f} QPS",
                flush=True,
            )


if __name__ == "__main__":
    main()
