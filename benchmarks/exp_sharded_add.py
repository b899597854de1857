"""Sharded-family device-resident build + O(batch) incremental add
(VERDICT r4 next #1's measurement criterion).

Criteria: a device-array add to a STAGED sharded 1M x 384 index costs
< 1 s steady on a 1-device mesh with no host-link corpus traffic (the
r4 state pulled every add through the 1-30 MB/s host link and restaged
the whole corpus on the next search), and a filtered search via
id_mask pushdown runs within a few percent of unfiltered.

Usage: python benchmarks/exp_sharded_add.py [--n 1048576] [--d 384]
       [--kind sharded_ivf|sharded_flat]
       (TPU job — run alone; CLAUDE.md hazard #5)
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_048_576)
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=262_144)
    p.add_argument("--add", type=int, default=10_000)
    p.add_argument("--kind", choices=["sharded_ivf", "sharded_flat"],
                   default="sharded_ivf")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    n, d, chunk = args.n, args.d, args.chunk
    assert n % chunk == 0
    n_chunks = n // chunk
    n_gen_clusters = 4096

    def gen(key_idx, count):
        @jax.jit
        def _gen(marker):
            kc, kn = jax.random.split(jax.random.key(key_idx))
            centers = jax.random.normal(
                jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
            )
            cid = jax.random.randint(kc, (marker.shape[0],), 0, n_gen_clusters)
            return centers[cid] * 3.0 + jax.random.normal(
                kn, (marker.shape[0], d), dtype=jnp.float32
            )

        return _gen(jnp.zeros((count,), jnp.int8))

    from c99_vectordb_tpu.parallel.mesh import default_data_mesh
    from c99_vectordb_tpu.parallel.sharded import (
        ShardedFlatIndex, ShardedIVFIndex,
    )

    mesh = default_data_mesh()
    print(f"# {args.kind} device build+add {n} x {d} on "
          f"{jax.default_backend()}, mesh devices={mesh.size}", flush=True)
    results: dict = {"config": vars(args), "mesh_devices": mesh.size}

    if args.kind == "sharded_ivf":
        idx = ShardedIVFIndex(
            dim=d, nlist=args.nlist, nprobe=4, scan_dtype="int8",
            mesh=mesh,
        )
    else:
        idx = ShardedFlatIndex(dim=d, scan_dtype="int8", mesh=mesh)

    queries = gen(9999, 128)

    t0 = time.perf_counter()
    first = gen(0, chunk)
    jax.block_until_ready(first)
    t = time.perf_counter()
    if hasattr(idx, "train"):
        idx.train(first, iters=8)
    t_train = time.perf_counter() - t
    t = time.perf_counter()
    for ci in range(n_chunks):
        x = first if ci == 0 else gen(ci, chunk)
        ids = jnp.arange(ci * chunk, (ci + 1) * chunk, dtype=jnp.int32)
        idx.add(x, ids)
        del x
    del first
    t_adds = time.perf_counter() - t
    assert idx._mode == "device", idx._mode
    t = time.perf_counter()
    idx._stage()
    t_stage = time.perf_counter() - t
    t = time.perf_counter()
    d0, i0 = idx.search(queries, k=10)
    t_search1 = time.perf_counter() - t
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s = train {t_train:.1f} + adds {t_adds:.1f} "
          f"+ stage {t_stage:.1f} + first-search {t_search1:.1f} "
          f"(ntotal={idx.ntotal})", flush=True)
    results.update(
        build_s=round(build_s, 2), train_s=round(t_train, 2),
        adds_s=round(t_adds, 2), stage_s=round(t_stage, 2),
        first_search_s=round(t_search1, 2),
    )

    t0 = time.perf_counter()
    d1, i1 = idx.search(queries, k=10)
    results["warm_search_s"] = round(time.perf_counter() - t0, 4)

    # Incremental add into the staged index. The first add compiles the
    # tail write programs; adds that cross a pow2 tail capacity grow the
    # buffers (one compile per new capacity, amortized by doubling).
    # "steady" = the first add that lands INSIDE existing capacity — no
    # growth, every program compiled.
    key_idx = 777
    steady_done = False
    label = "incremental_add_s"
    while not steady_done:
        grow_free = (
            idx._tail is not None
            and idx._tail.count + args.add <= idx._tail.cap
        )
        if grow_free:
            label, steady_done = "steady_add_s", True
        new = gen(key_idx, args.add)
        new_ids = jnp.arange(
            idx.ntotal, idx.ntotal + args.add, dtype=jnp.int32
        )
        jax.block_until_ready(new)
        t0 = time.perf_counter()
        idx.add(new, new_ids)
        add_s = time.perf_counter() - t0
        assert idx._staged is not None and idx._tail is not None
        print(f"{label}: {add_s:.3f}s (tail={idx._tail.count}, "
              f"cap={idx._tail.cap})", flush=True)
        results[label] = round(add_s, 3)
        t0 = time.perf_counter()
        d2, i2 = idx.search(queries, k=10)
        results[label + "_post_search_s"] = round(time.perf_counter() - t0, 4)
        key_idx += 1
        label = "grow_add_s"

    # Steady post-add search (everything compiled).
    t0 = time.perf_counter()
    d3, i3 = idx.search(queries, k=10)
    results["steady_post_add_search_s"] = round(time.perf_counter() - t0, 4)

    # Filter pushdown: same-k search under a 10%-selectivity mask; the
    # second call reuses the staged masked operands. Timed as a short
    # same-process loop (wall clock; the staged mask makes the scan
    # itself identical work).
    cap = idx.ntotal + 1024
    rng = np.random.default_rng(5)
    mask = rng.random(cap) < 0.1
    t0 = time.perf_counter()
    dm, im = idx.search(queries, k=10, id_mask=mask)
    results["masked_first_s"] = round(time.perf_counter() - t0, 3)
    got = np.asarray(im)
    assert ((got < 0) | mask[got.clip(0)]).all(), "mask leak"

    def loop(fn, reps=20):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    plain_s = loop(lambda: idx.search(queries, k=10))
    masked_s = loop(lambda: idx.search(queries, k=10, id_mask=mask))
    results["plain_search_s"] = round(plain_s, 5)
    results["masked_search_s"] = round(masked_s, 5)
    results["masked_over_plain"] = round(masked_s / plain_s, 3)
    print(f"search {plain_s*1e3:.2f} ms plain vs {masked_s*1e3:.2f} ms "
          f"masked (x{masked_s/plain_s:.2f})", flush=True)

    # In-place removal on the staged index.
    t0 = time.perf_counter()
    removed = idx.remove_ids(np.arange(100, dtype=np.int64))
    results["remove_100_s"] = round(time.perf_counter() - t0, 3)
    assert removed == 100 and idx._staged is not None
    print(f"in-place remove of 100 ids: {results['remove_100_s']}s", flush=True)

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
