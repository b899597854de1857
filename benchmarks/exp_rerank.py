"""Profile the exact-rerank stage's components on TPU at 1M x 768.

The composed ivf_flat+rerank path measured 46k QPS vs 230k raw (p=1) —
~17us/query of rerank overhead for 40 candidates. Which part:
searchsorted (id->position), the row gather, or the merge? Run each
variant in an on-device scan chain (host timing is unreliable here).
"""

from __future__ import annotations

import time

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

from c99_vectordb_tpu.ops.topk import merge_topk

N, D, B, R, K = 1_048_576, 768, 128, 40, 10


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


def main():
    db = gen(0, N)
    ids = jnp.arange(N, dtype=jnp.int32)
    rng = np.random.default_rng(0)
    # Fixed candidate set per query slot (shapes match the product path).
    cand_host = rng.integers(0, N, (B, R)).astype(np.int32)
    cand = jnp.asarray(np.sort(cand_host, axis=1))
    float(jnp.sum(db[0]))

    def searchsorted_only(q, db, ids, cand):
        pos = jnp.searchsorted(ids, cand)
        return pos.astype(jnp.float32) + q[0, 0] * 0.0

    def gather_only(q, db, ids, cand):
        vecs = db[cand]
        return jnp.sum(vecs, axis=-1)

    def gather_dist(q, db, ids, cand):
        vecs = db[cand]
        diff = vecs - q[:, None, :]
        return jnp.sum(diff * diff, axis=-1)

    def full_rerank(q, db, ids, cand):
        pos = jnp.searchsorted(ids, cand)
        rows = jnp.clip(pos, 0, N - 1)
        vecs = db[rows]
        diff = vecs - q[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
        return merge_topk(exact, cand, K)

    def norow_rerank(q, db, ids, cand):
        vecs = db[cand]  # candidates ARE rows (no searchsorted)
        diff = vecs - q[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
        return merge_topk(exact, cand, K)

    def merge_only(q, db, ids, cand):
        fake = cand.astype(jnp.float32) + q[:, :R] * 0.0
        return merge_topk(fake, cand, K)

    ops = (db, ids, cand)
    for name, fn in [
        ("searchsorted", searchsorted_only),
        ("gather", gather_only),
        ("gather+dist", gather_dist),
        ("merge", merge_only),
        ("full rerank", full_rerank),
        ("rerank no-searchsorted", norow_rerank),
    ]:
        qps = timed_qps(fn, ops)
        print(f"{name:<24} {qps:>12,.0f} QPS  ({1e6 / qps:.2f} us/query)", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
