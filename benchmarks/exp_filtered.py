"""Filtered-search pushdown on the real chip (VERDICT r3 next #8).

Done criterion: at 1M scale a masked (10% selectivity) search must match
the post-filter oracle and hold >= 50% of unfiltered QPS. Mechanism
under test: the +inf-norms exclusion operand staged once per mask — the
scan kernels run unchanged, so filtered throughput should be ~identical
to unfiltered.

Usage: python benchmarks/exp_filtered.py   (TPU job — run alone)
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

import argparse

N, D, K, B = 1_048_576, 768, 10, 128
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_qps(fn, iters=6):
    def run(steps):
        qs = gen(jnp.zeros((steps * B,)), 7).reshape(steps, B, D)

        import functools

        @functools.partial(jax.jit)
        def chain(qstack):
            def body(s, q):
                out_d, _ = fn(q + s * 0.0)
                return s + out_d[0, 0] * 0.0 + 1.0, None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
            return s

        float(chain(qs))
        t0 = time.perf_counter()
        float(chain(qs))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if (t_hi - t_lo) >= 0.5 or hi >= 512:
            break
        hi *= 4
    return B * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main() -> int:
    from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex

    ap = argparse.ArgumentParser()
    ap.add_argument("--selectivity", type=float, default=0.10)
    ap.add_argument("--nprobe", type=int, default=4)
    args = ap.parse_args()
    print(f"# filtered pushdown 1M x {D} on {jax.default_backend()} "
          f"(selectivity {args.selectivity}, p={args.nprobe})", flush=True)
    results = {"config": vars(args)}
    db = gen(jnp.zeros((N,)), 0)
    ids = jnp.arange(N, dtype=jnp.int32)
    rng = np.random.default_rng(3)
    mask = rng.random(N) < args.selectivity
    results["selectivity"] = float(mask.mean())

    idx = IVFFlatIndex(dim=D, nlist=4096, nprobe=args.nprobe, scan_dtype="int8")
    t0 = time.perf_counter()
    idx.train(db, iters=8)
    idx.add(db, ids)
    queries = np.asarray(gen(jnp.zeros((B,)), 9999))
    d_u, i_u = idx.search(queries, K)
    print(f"built+staged in {time.perf_counter() - t0:.1f}s", flush=True)

    # Oracle parity on the KERNEL path: masked search vs post-filtering
    # a deep unmasked search.
    d_m, i_m = idx.search(queries, K, id_mask=mask)
    deep_d, deep_i = idx.search(queries, 4096, nprobe=args.nprobe)
    ok = 0
    for qi in range(B):
        keep = [
            (d, i) for d, i in zip(deep_d[qi], deep_i[qi])
            if i >= 0 and mask[i]
        ][:K]
        want = [i for _, i in keep]
        got = [i for i in i_m[qi] if i >= 0][: len(want)]
        ok += got == want
    results["oracle_parity"] = ok / B
    print(f"masked-vs-postfilter parity: {ok}/{B} queries", flush=True)

    # Timing: wall-clock over repeated product-path searches with
    # DEVICE-resident queries (a host-side query batch would re-pay
    # 400 KB over the 1-30 MB/s link per call and drown the scan);
    # per-call dispatch overhead is identical on both sides of the A/B.
    q_dev = gen(jnp.zeros((B,)), 9999)

    def wall_qps(**kw):
        idx.search(q_dev, K, **kw)          # warm/compile
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            idx.search(q_dev, K, **kw)
        return B * reps / (time.perf_counter() - t0)

    qps_unfiltered = wall_qps()
    qps_filtered = wall_qps(id_mask=mask)
    results["qps_unfiltered"] = round(qps_unfiltered, 1)
    results["qps_filtered"] = round(qps_filtered, 1)
    results["filtered_over_unfiltered"] = round(qps_filtered / qps_unfiltered, 3)
    print(
        f"wall QPS unfiltered {qps_unfiltered:,.0f} vs filtered "
        f"{qps_filtered:,.0f} ({results['filtered_over_unfiltered']:.2f}x)",
        flush=True,
    )
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
