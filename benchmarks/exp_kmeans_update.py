"""Lloyd-update strategy: scatter-add vs one-hot MXU matmul.

ops/kmeans.py accumulates per-cluster sums with `sums.at[assign].add(...)`
— an XLA scatter-add, a known TPU slow path (serialized row updates).
The TPU-idiomatic alternative casts the update as a matmul:

    onehot = (assign[:, None] == iota[None, :])      # (chunk, k)
    sums  += onehot.T @ block                         # (k, chunk)@(chunk, D) MXU
    counts += onehot.sum(0)

which is the same FLOP class as the assignment matmul itself, so a
Lloyd iteration becomes two MXU passes over the data. Caveat: DEFAULT
precision multiplies in bf16 — the one-hot operand is exact (0/1), but
the data operand is rounded, perturbing centroid sums by ~0.4 % relative
per element. Variants measured:

  scatter      — shipped baseline
  onehot       — DEFAULT precision (bf16 multiply)
  onehot_hi    — Precision.HIGHEST (6-pass, ~f32-exact)

at the IVF coarse shape (1M x 768, k=4096) and the PQ multi shape
(m=96 subspaces, 1M x 8, k=256). Per-iteration device time via the
iters-chain differencing trick (Lloyd already runs under lax.scan).
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

N, D, K = 1_048_576, 768, 4096
CHUNK = 2048


def make_lloyd(n, dim, k, iters, chunk, update):
    n_chunks = n // chunk

    @jax.jit
    def run(data, valid, init_centroids):
        chunks = data.reshape(n_chunks, chunk, dim)
        valid_chunks = valid.reshape(n_chunks, chunk)

        def lloyd_iter(centroids, _):
            c_sq = jnp.sum(centroids * centroids, axis=1)

            def accumulate(carry, inputs):
                sums, counts = carry
                block, block_valid = inputs
                ip = jnp.dot(block, centroids.T, preferred_element_type=jnp.float32)
                assign = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)
                w = block_valid.astype(jnp.float32)
                if update == "scatter":
                    sums = sums.at[assign].add(block * w[:, None])
                    counts = counts.at[assign].add(w)
                else:
                    onehot = (
                        assign[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
                    ).astype(jnp.float32) * w[:, None]
                    prec = (
                        jax.lax.Precision.HIGHEST
                        if update == "onehot_hi"
                        else jax.lax.Precision.DEFAULT
                    )
                    sums = sums + jnp.dot(
                        onehot.T, block,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    counts = counts + jnp.sum(onehot, axis=0)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                accumulate,
                (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32)),
                (chunks, valid_chunks),
            )
            fresh = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where((counts > 0.0)[:, None], fresh, centroids), None

        final, _ = jax.lax.scan(lloyd_iter, init_centroids, None, length=iters)
        return final

    return run


def make_lloyd_multi(m, n, dim, k, iters, chunk, update):
    n_chunks = n // chunk

    def single(data, valid, init_centroids):
        chunks = data.reshape(n_chunks, chunk, dim)
        valid_chunks = valid.reshape(n_chunks, chunk)

        def lloyd_iter(centroids, _):
            c_sq = jnp.sum(centroids * centroids, axis=1)

            def accumulate(carry, inputs):
                sums, counts = carry
                block, block_valid = inputs
                ip = jnp.dot(block, centroids.T, preferred_element_type=jnp.float32)
                assign = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)
                w = block_valid.astype(jnp.float32)
                if update == "scatter":
                    sums = sums.at[assign].add(block * w[:, None])
                    counts = counts.at[assign].add(w)
                else:
                    onehot = (
                        assign[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
                    ).astype(jnp.float32) * w[:, None]
                    sums = sums + jnp.dot(
                        onehot.T, block, preferred_element_type=jnp.float32
                    )
                    counts = counts + jnp.sum(onehot, axis=0)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                accumulate,
                (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32)),
                (chunks, valid_chunks),
            )
            fresh = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where((counts > 0.0)[:, None], fresh, centroids), None

        final, _ = jax.lax.scan(lloyd_iter, init_centroids, None, length=iters)
        return final

    return jax.jit(jax.vmap(single, in_axes=(0, None, 0)))


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (K, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, K)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def bench(label, build_fn, args, iters_pair=(2, 6)):
    # Host timing is only trustworthy behind a scalar READBACK on this
    # relay (block_until_ready can resolve before execution completes —
    # CLAUDE.md hazard #2), hence the float(out.ravel()[0]) syncs.
    lo, hi = iters_pair
    f_lo, f_hi = build_fn(lo), build_fn(hi)
    float(jnp.ravel(f_lo(*args))[0])
    float(jnp.ravel(f_hi(*args))[0])
    t = {}
    for name, f in (("lo", f_lo), ("hi", f_hi)):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            float(jnp.ravel(out)[0])
            best = min(best, time.perf_counter() - t0)
        t[name] = best
    per_iter = (t["hi"] - t["lo"]) / (hi - lo)
    print(f"{label}: {per_iter * 1e3:8.1f} ms/iter", flush=True)
    return f_hi(*args)


def main():
    which = set(sys.argv[1:]) or {"coarse", "pq"}

    if "coarse" in which:
        data = gen(jnp.zeros((N,)), 0)
        valid = jnp.ones((N,), jnp.float32)
        init = data[:K]
        jax.block_until_ready((data, init))
        outs = {}
        for update in ("scatter", "onehot", "onehot_hi"):
            outs[update] = bench(
                f"coarse 1Mx768 k=4096 {update:10s}",
                lambda it, u=update: make_lloyd(N, D, K, it, CHUNK, u),
                (data, valid, init),
            )
        ref = np.asarray(outs["scatter"])
        for u in ("onehot", "onehot_hi"):
            diff = np.abs(np.asarray(outs[u]) - ref)
            rel = diff.max() / (np.abs(ref).max() + 1e-9)
            print(f"  {u} vs scatter: max abs diff {diff.max():.3e} (rel {rel:.2e})")
        del data, outs

    if "pq" in which:
        m, dsub, ksub = 96, 8, 256
        base = gen(jnp.zeros((N,)), 2)
        data_subs = jnp.transpose(
            base.reshape(N, m, dsub), (1, 0, 2)
        )  # (m, N, dsub)
        valid = jnp.ones((N,), jnp.float32)
        init = data_subs[:, :ksub]
        jax.block_until_ready((data_subs, init))
        del base
        for update in ("scatter", "onehot"):
            bench(
                f"pq m=96 1Mx8 k=256 {update:10s}",
                lambda it, u=update: make_lloyd_multi(m, N, dsub, ksub, it, CHUNK, u),
                (data_subs, valid, init),
            )


if __name__ == "__main__":
    main()
