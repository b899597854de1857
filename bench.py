"""Headline benchmark: batched exact Flat search QPS at 1M x 768-d, k=10.

Measures the fused Pallas score+top-k kernel on the available accelerator
and compares against a CPU brute-force baseline (torch matmul + topk — a
stand-in for CPU FAISS IndexFlat, which uses the same BLAS-bound
algorithm; FAISS itself is not installable in this image, and the
reference publishes no numbers of its own — BASELINE.md).

Prints ONE JSON line:
  {"metric": "flat_qps_1M_768d", "value": <TPU QPS>, "unit": "qps",
   "vs_baseline": <TPU QPS / CPU brute-force QPS>}

Environment overrides: C99VDB_BENCH_N / _D / _B / _K / _ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


def bench_tpu(n: int, d: int, b: int, k: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from c99_vectordb_tpu.ops.topk_pallas import fused_topk

    key = jax.random.key(0)
    kd, kq = jax.random.split(key)
    # Generate the corpus directly on device: no host->device transfer.
    db = jax.random.normal(kd, (n, d), dtype=jnp.float32)
    ids = jnp.arange(n, dtype=jnp.int32)
    sq_norms = jnp.sum(db * db, axis=1)
    queries = jax.random.normal(kq, (b, d), dtype=jnp.float32)
    jax.block_until_ready((db, sq_norms, queries))

    def run():
        return fused_topk(db, ids, sq_norms, queries, k)

    jax.block_until_ready(run())  # compile + warm
    jax.block_until_ready(run())

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return b * iters / dt


def bench_cpu_baseline(n: int, d: int, b: int, k: int) -> float:
    """CPU brute force via torch (MKL-backed matmul + topk), one batch."""
    import torch

    torch.manual_seed(0)
    db = torch.randn(n, d)
    sq = (db * db).sum(1)
    queries = torch.randn(b, d)

    def run():
        scores = sq[None, :] - 2.0 * (queries @ db.T)
        return torch.topk(scores, k, dim=1, largest=False)

    run()  # warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = time.perf_counter() - t0
    return b * reps / dt


def main() -> int:
    import jax

    on_tpu = jax.default_backend() == "tpu"
    n = _env_int("C99VDB_BENCH_N", 1_000_000 if on_tpu else 65_536)
    d = _env_int("C99VDB_BENCH_D", 768)
    b = _env_int("C99VDB_BENCH_B", 128)
    k = _env_int("C99VDB_BENCH_K", 10)
    iters = _env_int("C99VDB_BENCH_ITERS", 10 if on_tpu else 2)
    # pad n to the kernel's tile multiple
    tile_n = 1024
    n = ((n + tile_n - 1) // tile_n) * tile_n

    qps = bench_tpu(n, d, b, k, iters)
    # Baseline on a capped corpus, scaled linearly (brute force is O(n)).
    base_n = min(n, 262_144)
    cpu_qps = bench_cpu_baseline(base_n, d, b, k) * (base_n / n)

    print(
        json.dumps(
            {
                "metric": f"flat_qps_{n // 1000}k_{d}d_k{k}_b{b}",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
