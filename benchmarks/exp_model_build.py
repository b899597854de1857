"""Model-class device-resident build + incremental add (VERDICT r3 #1).

Criteria: IVFPQIndex 1M x 384 build through the PRODUCT class <= 15 s
with device inputs (the old host-link path measured 124.7 s; the raw
benchmark recipe 9.1 s), and a 10k-row add to the staged 1M index < 1 s
(O(batch) tail, no restage) with search results intact.

Usage: python benchmarks/exp_model_build.py [--n 1048576] [--d 384]
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
    p.add_argument("--m", type=int, default=48)
    p.add_argument("--nlist", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=262_144)
    p.add_argument("--add", type=int, default=10_000)
    p.add_argument("--kind", choices=["ivf_pq", "ivf_flat"], default="ivf_pq")
    p.add_argument("--pad-cap", type=int, default=None,
                   help="IVFFlatIndex inverted-list capacity (spill)")
    p.add_argument("--corpus", choices=["clustered", "zipf"],
                   default="clustered")
    p.add_argument("--capacity", type=int, default=None,
                   help="IVFPQIndex declared capacity: one exact refine-"
                        "store allocation + eager scatter (the 10M shape)")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    n, d, chunk = args.n, args.d, args.chunk
    n_chunks = n // chunk
    assert n % chunk == 0
    n_gen_clusters = 4096

    zipf = args.corpus == "zipf"

    def gen(key_idx, count):
        @jax.jit
        def _gen(marker):
            kc, kn = jax.random.split(jax.random.key(key_idx))
            centers = jax.random.normal(
                jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
            )
            if zipf:
                ranks = jnp.arange(1, n_gen_clusters + 1, dtype=jnp.float32)
                w = 1.0 / ranks ** 1.1
                cdf = jnp.cumsum(w) / jnp.sum(w)
                u = jax.random.uniform(kc, (marker.shape[0],))
                cid = jnp.clip(
                    jnp.searchsorted(cdf, u).astype(jnp.int32),
                    0, n_gen_clusters - 1,
                )
            else:
                cid = jax.random.randint(
                    kc, (marker.shape[0],), 0, n_gen_clusters
                )
            return centers[cid] * 3.0 + jax.random.normal(
                kn, (marker.shape[0], d), dtype=jnp.float32
            )

        return _gen(jnp.zeros((count,), jnp.int8))

    print(f"# {args.kind} model-class build {n} x {d} on {jax.default_backend()}",
          flush=True)
    results: dict = {"config": vars(args)}

    if args.kind == "ivf_pq":
        from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex

        idx = IVFPQIndex(
            dim=d, nlist=args.nlist, nprobe=4, m=args.m,
            refine=True, refine_factor=16, refine_dtype="bfloat16",
            capacity=args.capacity,
        )
    else:
        from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex

        idx = IVFFlatIndex(
            dim=d, nlist=args.nlist, nprobe=4,
            scan_dtype="int8", rerank_dtype="bfloat16",
            pad_cap=args.pad_cap,
        )

    queries = gen(9999, 128)

    t0 = time.perf_counter()
    first = gen(0, chunk)
    jax.block_until_ready(first)
    t = time.perf_counter()
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
    t = time.perf_counter()
    idx._stage()
    t_stage = time.perf_counter() - t
    t = time.perf_counter()
    d0, i0 = idx.search(queries, k=10)   # first compile of the search
    t_search1 = time.perf_counter() - t
    build_s = time.perf_counter() - t0
    if args.kind == "ivf_flat":
        # Diagnostic pull AFTER the timed window: the (nlist, pad) id
        # canvas crosses the slow host link (hazard #3) and would
        # otherwise contaminate build_s.
        per_list = (np.asarray(idx._staged[3]) >= 0).sum(axis=1)
        results["max_list"] = int(per_list.max())
        results["pad"] = int(idx._staged[6])
        print(f"max list {per_list.max()} pad {idx._staged[6]}"
              + (f" (cap {args.pad_cap})" if args.pad_cap else ""),
              flush=True)
    print(f"build {build_s:.1f}s = train {t_train:.1f} + encode/adds "
          f"{t_adds:.1f} + stage {t_stage:.1f} + first-search {t_search1:.1f} "
          f"(ntotal={idx.ntotal})", flush=True)
    results["build_s"] = round(build_s, 2)
    results["train_s"] = round(t_train, 2)
    results["adds_s"] = round(t_adds, 2)
    results["stage_s"] = round(t_stage, 2)
    results["first_search_s"] = round(t_search1, 2)

    # Warm search for reference timing.
    t0 = time.perf_counter()
    d1, i1 = idx.search(queries, k=10)
    warm_search_s = time.perf_counter() - t0
    results["warm_search_s"] = round(warm_search_s, 4)

    # Incremental add: 10k rows into the staged index.
    new = gen(777, args.add)
    new_ids = jnp.arange(n, n + args.add, dtype=jnp.int32)
    jax.block_until_ready(new)
    t0 = time.perf_counter()
    idx.add(new, new_ids)
    add_s = time.perf_counter() - t0
    assert idx._staged is not None and idx._tail is not None
    print(f"incremental add of {args.add} rows: {add_s:.3f}s "
          f"(tail={idx._tail.count})", flush=True)
    results["incremental_add_s"] = round(add_s, 3)

    # First post-add search compiles the tail-merge programs; the second
    # is the steady state.
    t0 = time.perf_counter()
    d2, i2 = idx.search(queries, k=10)
    results["post_add_search_compile_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    d3, i3 = idx.search(queries, k=10)
    results["post_add_search_s"] = round(time.perf_counter() - t0, 4)

    # Steady state: a SECOND same-size add (all programs now compiled).
    new2 = gen(778, args.add)
    new2_ids = jnp.arange(n + args.add, n + 2 * args.add, dtype=jnp.int32)
    jax.block_until_ready(new2)
    t0 = time.perf_counter()
    idx.add(new2, new2_ids)
    add2_s = time.perf_counter() - t0
    print(f"steady-state add of {args.add} rows: {add2_s:.3f}s", flush=True)
    results["steady_add_s"] = round(add2_s, 3)
    t0 = time.perf_counter()
    idx.search(queries, k=10)
    results["steady_post_add_search_s"] = round(time.perf_counter() - t0, 4)

    # Sanity: results before/after add agree except where new rows win.
    moved = int((np.asarray(i1) != np.asarray(i3)).sum())
    newcnt = int((np.asarray(i3) >= n).sum())
    results["changed_slots"] = moved
    results["new_row_hits"] = newcnt
    print(f"post-add: {moved} result slots changed, {newcnt} new-row hits",
          flush=True)

    # Restage-inside-a-search: add past the restage threshold, then time
    # the search that pays the tail fold (the production latency spike).
    # With pad_cap this exercises the round-5 INCREMENTAL cap
    # maintenance — only the tail rows re-place/re-encode
    # (devbuild.capped_assign_incremental) instead of the full-corpus
    # capped_assign (VERDICT r4 weak #5: 31 s stage / 6.3 s restage at
    # 1M zipf). Two cycles: the first may still compile the incremental
    # programs; the second is the warm steady state.
    from c99_vectordb_tpu.models.devbuild import tail_restage_threshold

    gen_key = 900
    for label in ("restage_in_search_cold_s", "restage_in_search_warm_s"):
        while not idx._restage_needed:
            batch = gen(gen_key, args.add)
            bids = jnp.arange(
                idx.ntotal + n, idx.ntotal + n + args.add, dtype=jnp.int32
            )
            jax.block_until_ready(batch)
            idx.add(batch, bids)
            gen_key += 1
        t0 = time.perf_counter()
        d4, i4 = idx.search(queries, k=10)
        restage_s = time.perf_counter() - t0
        assert idx._tail is None
        results[label] = round(restage_s, 3)
        print(f"{label}: {restage_s:.3f}s "
              f"(threshold {tail_restage_threshold(idx.ntotal)})", flush=True)
    if args.pad_cap:
        canvas_ids = idx._staged[3] if args.kind == "ivf_flat" else idx._staged[4]
        per_list = (np.asarray(canvas_ids) >= 0).sum(axis=1)
        assert per_list.max() <= args.pad_cap, int(per_list.max())
        print(f"post-restage max list {per_list.max()} (cap {args.pad_cap})",
              flush=True)

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
