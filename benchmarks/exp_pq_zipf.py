"""Heavy-tailed (Zipf) corpus validation for the IVF-PQ family
(VERDICT r4 weak #4 / next #3): do the SQ8-family zipf conclusions —
maximin seeding beats mass-proportional Forgy at equal probes, and
pad_cap doubling is the recall lever — hold when residual codebooks
retrain per coarse assignment?  Runs through the PRODUCT class
(IVFPQIndex(pad_cap=...)) and asserts max-list == cap at 1M zipf.

Corpus: the run10m.py --corpus zipf recipe (Zipf s=1.1 cluster sizes,
largest generator ~9% of rows, lognormal per-cluster spreads),
1M x 384, nlist=4096.  Ground truth at Precision.HIGHEST (CLAUDE.md
hazard #8).  QPS here is MODEL-CLASS wall-clock (dispatch + host pull
included) — the recall columns are the point; kernel-level zipf QPS
lives in the SQ8 table (BASELINE.md round 4).

Usage: python benchmarks/exp_pq_zipf.py [--quick]
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
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--m", type=int, default=48)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=262_144)
    p.add_argument("--kmeans-iters", type=int, default=8)
    p.add_argument("--nprobes", type=str, default="4,8,16")
    p.add_argument("--refine-factors", type=str, default="16,64",
                   help="comma list: ADC shortlist depth = k * factor")
    p.add_argument(
        "--configs", type=str,
        default="2048:maximin,2048:sample,4096:maximin,4096:maximin:opq",
        help="comma list of pad_cap:init[:opq] build configurations")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    if args.quick:
        args.n, args.chunk, args.nlist = 65_536, 16_384, 256
        args.configs = "256:maximin,256:sample"
        args.nprobes, args.refine_factors = "4", "16"
    n, d, b, k = args.n, args.d, args.b, args.k
    chunk = args.chunk
    n_chunks = n // chunk
    assert n % chunk == 0
    n_gen_clusters = 4096
    nprobes = [int(s) for s in args.nprobes.split(",")]
    rfactors = [int(s) for s in args.refine_factors.split(",")]

    def gen(key_idx, count):
        # The run10m.py zipf recipe: heavy-tailed cluster SIZES via
        # inverse-CDF sampling of Zipf(s=1.1) weights + lognormal
        # per-cluster SPREADS.
        @jax.jit
        def _gen(marker):
            kc, kn = jax.random.split(jax.random.key(key_idx))
            centers = jax.random.normal(
                jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
            )
            ranks = jnp.arange(1, n_gen_clusters + 1, dtype=jnp.float32)
            w = 1.0 / ranks ** 1.1
            cdf = jnp.cumsum(w) / jnp.sum(w)
            u = jax.random.uniform(kc, (marker.shape[0],))
            cid = jnp.clip(
                jnp.searchsorted(cdf, u).astype(jnp.int32),
                0, n_gen_clusters - 1,
            )
            spread = jnp.exp(
                0.5 * jax.random.normal(
                    jax.random.key(11), (n_gen_clusters,), jnp.float32
                )
            )
            return centers[cid] * 3.0 + spread[cid][:, None] * (
                jax.random.normal(kn, (marker.shape[0], d), jnp.float32)
            )

        return _gen(jnp.zeros((count,), jnp.int8))

    print(f"# pq zipf {n} x {d} nlist={args.nlist} m={args.m} "
          f"on {jax.default_backend()}", flush=True)
    results: dict = {"config": vars(args)}

    queries = gen(9999, b)
    q_sq = jnp.sum(queries * queries, axis=1)

    # ---- ground truth (exact, HIGHEST precision, chunk-regenerated) ----
    @jax.jit
    def gt_chunk(q, qs, x, base, best_d, best_i):
        xs = jnp.sum(x * x, axis=1)
        dist = (
            qs[:, None] + xs[None, :]
            - 2.0 * jax.lax.dot_general(
                q, x, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        ids = base + jnp.arange(x.shape[0], dtype=jnp.int32)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids[None, :], dist.shape)], axis=1
        )
        nd, ni = jax.lax.top_k(-cat_d, k)
        return -nd, jnp.take_along_axis(cat_i, ni, axis=1)

    t0 = time.perf_counter()
    best_d = jnp.full((b, k), jnp.inf, jnp.float32)
    best_i = jnp.full((b, k), -1, jnp.int32)
    for ci in range(n_chunks):
        x = gen(ci, chunk)
        best_d, best_i = gt_chunk(queries, q_sq, x, ci * chunk, best_d, best_i)
        del x
    gt_i = np.asarray(best_i)
    print(f"ground truth done ({time.perf_counter() - t0:.1f}s)", flush=True)

    def rec(ai):
        return sum(
            len(set(ai[q].tolist()) & set(gt_i[q].tolist())) for q in range(b)
        ) / gt_i.size

    from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex

    for spec in args.configs.split(","):
        parts = spec.split(":")
        cap, init = int(parts[0]), parts[1]
        opq = len(parts) > 2 and parts[2] == "opq"
        tag = f"cap{cap}_{init}" + ("_opq" if opq else "")
        print(f"== {tag} ==", flush=True)
        idx = IVFPQIndex(
            dim=d, nlist=args.nlist, nprobe=4, m=args.m,
            refine=True, refine_factor=rfactors[0],
            refine_dtype="bfloat16", pad_cap=cap, opq=opq,
        )
        t0 = time.perf_counter()
        first = gen(0, chunk)
        idx.train(first, iters=args.kmeans_iters, init=init)
        for ci in range(n_chunks):
            x = first if ci == 0 else gen(ci, chunk)
            ids = jnp.arange(ci * chunk, (ci + 1) * chunk, dtype=jnp.int32)
            idx.add(x, ids)
            del x
        del first
        idx._stage()
        build_s = time.perf_counter() - t0
        geo = idx.geometry_diagnostic()
        # The VERDICT r4 #3 "done" bar: the capped product build holds
        # the bound exactly on the corpus that inflates uncapped pads
        # ~23x (spill forces every over-cap list to fill to the cap).
        per_list = (np.asarray(idx._staged[4]) >= 0).sum(axis=1)
        assert per_list.max() <= cap, int(per_list.max())
        if not args.quick:
            assert per_list.max() == cap, int(per_list.max())
        entry: dict = {
            "build_s": round(build_s, 1),
            "max_list": int(per_list.max()),
            "spill_fraction": round(geo["spill_fraction"], 4),
            "max_cell_ratio": round(geo["max_cell_ratio"], 1),
            "heavy_tailed": bool(geo["heavy_tailed"]),
        }
        print(f"build {build_s:.1f}s  max_list={per_list.max()} (cap {cap})  "
              f"spill {geo['spill_fraction']:.1%}  "
              f"ratio {geo['max_cell_ratio']:.1f}x", flush=True)

        for rf in rfactors:
            idx.refine_factor = rf
            for nprobe in nprobes:
                d0, i0 = idx.search(queries, k=k, nprobe=nprobe)  # compile
                r = rec(np.asarray(i0))
                # Model-class QPS: sequential search calls; each host
                # pull forces real device sync, so plain wall-clock is
                # sound (unlike block_until_ready — hazard #2).
                reps = 3
                while True:
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        idx.search(queries, k=k, nprobe=nprobe)
                    dt = time.perf_counter() - t0
                    if dt >= 0.5 or reps >= 384:
                        break
                    reps *= 4
                qps = b * reps / dt
                key = f"{tag}_rf{rf}_p{nprobe}"
                entry[f"rf{rf}_p{nprobe}"] = {
                    "qps": round(qps, 1), "recall": round(r, 4)
                }
                print(f"  rf={rf} p={nprobe}: {qps:,.0f} QPS  "
                      f"recall@{k}={r:.4f}", flush=True)
        results[tag] = entry
        # Free the staged tuples too (CLAUDE.md hazard #10).
        idx._staged = None
        del idx, per_list

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
