"""Sharded IVF on a 1-device mesh vs the single-chip programs, 1M x 768.

VERDICT round-2 next #2's done criterion: the slot-sharded shard_map
route must be within ~15% of the single-chip IVFFlatIndex fast path on
one real chip (the shard_map wrapper + all_gather over a 1-device mesh
should be ~free). Same process, same staged arrays, same query stream.

Usage: python benchmarks/exp_sharded_1chip.py   (TPU; ~5 min)
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
from jax.sharding import NamedSharding, PartitionSpec as P

from c99_vectordb_tpu.models.base import list_pad, next_pow2
from c99_vectordb_tpu.ops.ivf_scan_pallas import (
    ivf_full_search_program, ivf_sq8_search_program,
)
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.ops.rerank import exact_rerank_rows, shortlist_depth
from c99_vectordb_tpu.parallel.mesh import make_mesh
from c99_vectordb_tpu.parallel.sharded import (
    sharded_ivf_search_program, sharded_ivf_sq8_search_program,
)

N, D, K, B = 1_048_576, 768, 10, 128
NLIST = 4096
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

    lv, ln, li = scatter(
        db, sq, jnp.asarray(order), jnp.asarray(sorted_lists), jnp.asarray(slots)
    )
    del db, sq
    print(f"staged pad={pad}", flush=True)

    from c99_vectordb_tpu.models.ivf_flat import _sq8_stage

    codes, dim_scale, dec_sqn = _sq8_stage(lv, li)
    ks = shortlist_depth(K, N)

    # 1-device mesh: slot layout for S=1 IS the plain layout, so the
    # same staged arrays serve both routes (device_put to the mesh
    # sharding is an on-device no-op copy for one chip).
    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])

    def sh(x, spec):
        return jax.device_put(x, NamedSharding(mesh1, spec))

    m_ops = {
        "centroids": sh(centroids, P(None, None)),
        "c_sq": sh(c_sq, P(None)),
        "lv": sh(lv, P(None, "data", None)),
        "ln": sh(ln, P(None, "data")),
        "li": sh(li, P(None, "data")),
        "codes": sh(codes, P(None, "data", None)),
        "scale": sh(dim_scale, P(None)),
        "dsq": sh(dec_sqn, P(None, "data")),
    }

    for p in (1, 4):
        # ---- single-chip routes
        exact_prog = ivf_full_search_program(
            NLIST, pad, D, B, p, K, exact=True, dense=p * pad <= 4096
        )
        sq8_prog = ivf_sq8_search_program(NLIST, pad, D, B, p, ks)

        def exact_step(q, c, csq, _lv, _ln, _li):
            return exact_prog(c, csq, _lv, _ln, _li, q)

        def sq8_step(q, c, csq, _lv, _li, _codes, _scale, _dsq):
            _, si, srows = sq8_prog(c, csq, _codes, _scale, _dsq, _li, q)
            return exact_rerank_rows(_lv.reshape(-1, D), srows, si, q, K)

        qps_e1 = timed_qps(exact_step, (centroids, c_sq, lv, ln, li), B)
        qps_q1 = timed_qps(
            sq8_step,
            (centroids, c_sq, lv, li, codes, dim_scale, dec_sqn),
            B,
        )

        # ---- sharded routes on the 1-device mesh
        sh_exact = sharded_ivf_search_program(
            mesh1, NLIST, pad, D, B, p, K, use_kernels=True
        )
        sh_sq8 = sharded_ivf_sq8_search_program(
            mesh1, NLIST, pad, D, B, p, K, ks
        )

        def sh_exact_step(q, c, csq, _lv, _ln, _li):
            return sh_exact(c, csq, _lv, _ln, _li, q)

        def sh_sq8_step(q, c, csq, _codes, _scale, _dsq, _li, _lv):
            return sh_sq8(c, csq, _codes, _scale, _dsq, _li, _lv, q)

        qps_e8 = timed_qps(
            sh_exact_step,
            (m_ops["centroids"], m_ops["c_sq"], m_ops["lv"], m_ops["ln"],
             m_ops["li"]),
            B,
        )
        qps_q8 = timed_qps(
            sh_sq8_step,
            (m_ops["centroids"], m_ops["c_sq"], m_ops["codes"],
             m_ops["scale"], m_ops["dsq"], m_ops["li"], m_ops["lv"]),
            B,
        )
        print(
            f"p={p}: f32 single {qps_e1:,.0f} vs sharded-1chip {qps_e8:,.0f} "
            f"({qps_e8 / qps_e1:.2f}x) | sq8 single {qps_q1:,.0f} vs "
            f"sharded-1chip {qps_q8:,.0f} ({qps_q8 / qps_q1:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
