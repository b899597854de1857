"""Sharded IVF-PQ on a 1-device mesh vs the single-chip refined path.

VERDICT round-3 next #2's done criterion: the slot-sharded PQ route now
runs the Pallas dense-ADC kernel per shard (parallel/sharded.py
sharded_pq_search_program, use_kernels=True) — this A/B must land within
~10% of the single-chip refined IVFPQIndex composite (top-200 band) on
one real chip, where the shard_map wrapper + 1-device all_gather should
be ~free. Same process, same trained quantizer, same query stream.

Usage: python benchmarks/exp_sharded_pq_1chip.py   (TPU job — run alone)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

N, D, K, B, M, KSUB = 1_048_576, 384, 10, 128, 48, 256
NLIST = 2048
K_ADC = 200
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_qps(step, ops, b, iters=6):
    import functools

    @functools.partial(jax.jit)
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
        if (t_hi > 1.5 * t_lo and t_hi - t_lo >= 0.5) or hi >= 512:
            break
        hi *= 4
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main() -> int:
    from c99_vectordb_tpu.models.base import list_pad
    from c99_vectordb_tpu.models.devbuild import (
        bucketize_device, scatter_list_ids_device, scatter_lists_device,
    )
    from c99_vectordb_tpu.ops.adc_pallas import (
        adc_dense_search_program, build_item_constants_device,
        stage_codes128_device,
    )
    from c99_vectordb_tpu.ops.kmeans import (
        assign_clusters, assign_clusters_multi, train_kmeans,
        train_kmeans_multi,
    )
    from c99_vectordb_tpu.ops.rerank import rerank_program_rows
    from c99_vectordb_tpu.parallel.mesh import make_mesh
    from c99_vectordb_tpu.parallel.sharded import sharded_pq_search_program

    print(f"# sharded-PQ 1-chip A/B {N} x {D} m={M} on {jax.default_backend()}",
          flush=True)
    t0 = time.perf_counter()
    db = gen(jnp.zeros((N,)), 0)
    centroids = train_kmeans(db, NLIST, iters=8, out_device=True)
    assign = assign_clusters(db, centroids, out_device=True)
    dsub = D // M

    @jax.jit
    def residual_subs(x, cents, a):
        return (x - cents[a]).reshape(x.shape[0], M, dsub).transpose(1, 0, 2)

    books = train_kmeans_multi(
        residual_subs(db, centroids, assign), KSUB, iters=8, out_device=True
    )
    codes = assign_clusters_multi(
        residual_subs(db, centroids, assign), books, out_device=True
    ).T.astype(jnp.uint8)
    ids = jnp.arange(N, dtype=jnp.int32)
    c_sq = jnp.sum(centroids * centroids, axis=1)

    order, lists, slots, counts = bucketize_device(assign, NLIST)
    pad = list_pad(int(counts.max(initial=1)))
    list_codes = scatter_lists_device(codes, order, lists, slots, NLIST, pad)
    li = scatter_list_ids_device(ids, order, lists, slots, NLIST, pad)
    item_const = build_item_constants_device(
        centroids, assign, codes, books, order, lists, slots, NLIST, pad
    )
    codes128 = stage_codes128_device(list_codes, M, KSUB)
    print(f"staged in {time.perf_counter() - t0:.1f}s (pad={pad})", flush=True)

    results = {}
    queries = gen(jnp.zeros((B,)), 9999)

    # ---- single-chip: dense ADC + rows-mode rerank (id-indexed store) --
    adc = adc_dense_search_program(NLIST, pad, D, M, KSUB, B, 1, K_ADC)
    rr = rerank_program_rows(N, D, B, K_ADC, K, "float32")

    def single_step(q, refine, *ao):
        _, ci = adc(*ao, q)
        return rr(refine, ci, ci, q)

    single_ops = (db, centroids, c_sq, books, codes128, item_const, li)
    d1, i1 = jax.jit(single_step)(queries, *single_ops)
    qps_single = timed_qps(single_step, single_ops, B)
    print(f"single-chip refined top-{K_ADC} p=1: {qps_single:,.0f} QPS", flush=True)
    results["single_qps"] = round(qps_single, 1)

    # ---- sharded on a 1-device mesh (kernels route) --------------------
    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])

    def sh(x, spec):
        return jax.device_put(x, NamedSharding(mesh1, spec))

    # Refine store in the sharded layout: (nlist, pad, D) bucketed rows.
    lv = scatter_lists_device(db, order, lists, slots, NLIST, pad)
    prog = sharded_pq_search_program(
        mesh1, NLIST, pad, D, M, KSUB, B, 1, K, K_ADC, use_kernels=True
    )
    sh_ops = (
        sh(centroids, P(None, None)),
        sh(c_sq, P(None)),
        sh(books, P(None, None, None)),
        sh(codes128, P(None, None, "data")),
        sh(item_const, P(None, "data")),
        sh(li, P(None, "data")),
        sh(lv, P(None, "data", None)),
    )

    def sharded_step(q, *ops):
        return prog(*ops, q, q)

    d2, i2 = jax.jit(sharded_step)(queries, *sh_ops)
    agree = float(np.mean(np.asarray(i1) == np.asarray(i2)))
    qps_sharded = timed_qps(sharded_step, sh_ops, B)
    print(f"sharded 1-dev-mesh kernels: {qps_sharded:,.0f} QPS "
          f"(id agreement {agree:.4f})", flush=True)
    results["sharded_qps"] = round(qps_sharded, 1)
    results["ratio"] = round(qps_sharded / qps_single, 3)
    results["id_agreement"] = round(agree, 4)

    # ---- the OLD route: XLA take_along_axis ADC inside shard_map --------
    prog_xla = sharded_pq_search_program(
        mesh1, NLIST, pad, D, M, KSUB, B, 1, K, K_ADC, use_kernels=False
    )
    xla_ops = (
        sh_ops[0], sh_ops[1], sh_ops[2],
        sh(list_codes, P(None, "data", None)),
        sh_ops[5], sh_ops[6],
    )

    def xla_step(q, *ops):
        return prog_xla(*ops, q, q)

    jax.jit(xla_step)(queries, *xla_ops)
    qps_xla = timed_qps(xla_step, xla_ops, B, iters=2)
    print(f"sharded 1-dev-mesh XLA-ADC (old route): {qps_xla:,.0f} QPS "
          f"({qps_sharded / qps_xla:.1f}x slower than kernels)", flush=True)
    results["sharded_xla_qps"] = round(qps_xla, 1)
    results["kernels_vs_xla"] = round(qps_sharded / qps_xla, 2)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
