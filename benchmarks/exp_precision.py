"""Experiment: is the recall plateau a bf16-matmul-GT artifact?

Round-1 finding: refined IVF-PQ plateaus at 0.978 strict recall@10 and
every miss sits at distance margin 0 to the k-th GT distance. Hypothesis:
the GT itself is computed with DEFAULT matmul precision (bf16 multiply on
TPU), which quantizes distances and creates spurious ties at the top-k
boundary. This script measures, at 1M x 768 clustered:

  1. #queries whose k-th boundary is tied, under DEFAULT vs HIGHEST GT
  2. recall of the DEFAULT-precision flat kernel vs the HIGHEST GT
  3. (optional --pq) refined-PQ recall vs both GTs

Run on TPU: python benchmarks/exp_precision.py
"""

from __future__ import annotations

import argparse

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()
    n, d, b, k = args.n, args.d, args.b, args.k
    n_gen_clusters = min(4096, max(64, n // 256))

    @jax.jit
    def gen_points(key_idx, count_marker):
        count = count_marker.shape[0]
        kc, kn = jax.random.split(jax.random.key(key_idx))
        centers = jax.random.normal(
            jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
        )
        cid = jax.random.randint(kc, (count,), 0, n_gen_clusters)
        return centers[cid] * 3.0 + jax.random.normal(kn, (count, d), dtype=jnp.float32)

    db = gen_points(0, jnp.zeros((n,)))
    q = gen_points(9, jnp.zeros((b,)))
    sq = jnp.sum(db * db, axis=1)
    q_sq = jnp.sum(q * q, axis=1)

    kk = 4 * k  # examine a margin window beyond the boundary

    def ranked(precision):
        @jax.jit
        def run(db, sq, q, q_sq):
            chunks = db.reshape(n // 2048, 2048, d)
            sq_chunks = sq.reshape(n // 2048, 2048)

            def step(carry, inp):
                best_d, best_i = carry
                block, block_sq, idx = inp
                ip = jax.lax.dot_general(
                    q, block.T, (((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )
                dist = block_sq[None, :] - 2.0 * ip + q_sq[:, None]
                ids = idx * 2048 + jnp.arange(2048, dtype=jnp.int32)
                alld = jnp.concatenate([best_d, dist], axis=1)
                alli = jnp.concatenate([best_i, jnp.broadcast_to(ids, (b, 2048))], axis=1)
                neg, pos = jax.lax.top_k(-alld, kk)
                return (-neg, jnp.take_along_axis(alli, pos, axis=1)), None

            init = (
                jnp.full((b, kk), jnp.inf, jnp.float32),
                jnp.full((b, kk), -1, jnp.int32),
            )
            (bd, bi), _ = jax.lax.scan(
                step, init,
                (chunks, sq_chunks, jnp.arange(n // 2048, dtype=jnp.int32)),
            )
            return bd, bi

        return run(db, sq, q, q_sq)

    d_def, i_def = ranked(jax.lax.Precision.DEFAULT)
    d_hi, i_hi = ranked(jax.lax.Precision.HIGHEST)
    d_def, i_def, d_hi, i_hi = map(np.asarray, (d_def, i_def, d_hi, i_hi))

    def tie_stats(dists, label):
        # boundary tie = distance at rank k-1 equals distance at rank k
        tied = np.sum(dists[:, k - 1] == dists[:, k])
        # distinct values in the top-2k window (low = heavy quantization)
        uniq = np.mean([len(np.unique(row[: 2 * k])) for row in dists])
        print(f"{label}: boundary-tied queries {tied}/{b}, "
              f"mean distinct dists in top{2*k}: {uniq:.1f}")

    tie_stats(d_def, "DEFAULT  GT")
    tie_stats(d_hi, "HIGHEST  GT")

    def recall(a, g):
        return sum(
            len(set(a[i, :k]) & set(g[i, :k])) for i in range(b)
        ) / (b * k)

    print(f"recall(default-kernel top{k} vs HIGHEST GT): {recall(i_def, i_hi):.4f}")
    print(f"recall(HIGHEST top{k} vs default GT):        {recall(i_hi, i_def):.4f}")

    # margin structure at the boundary of the HIGHEST GT
    margins = d_hi[:, k] - d_hi[:, k - 1]
    print(f"HIGHEST GT margin d[k]-d[k-1]: min={margins.min():.3e} "
          f"median={np.median(margins):.3e}")
    margins_def = d_def[:, k] - d_def[:, k - 1]
    print(f"DEFAULT GT margin d[k]-d[k-1]: min={margins_def.min():.3e} "
          f"median={np.median(margins_def):.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
