"""Hybrid heavy-tail index (VERDICT r4 stretch #9): route the DOMINANT
cells' rows to an exact flat-SQ8 sub-scan and keep capped IVF-SQ8 for
the clusterable remainder — attack the zipf frontier (r4: 0.794 @ 119k
p=4 cap=2048, 0.850 @ 60k p=4 cap=4096) with a structure-aware split
instead of more probes.

Design: one k-means (nlist=4096, maximin); cells with count > T move
whole to a flat SQ8 store scanned EXACTLY every query (the measured
zipf guidance — the dominant cluster's interior is locally iid, probes
can't help there); the remaining cells keep capped SQ8 inverted lists
(all <= T by construction, so no spill pass).  One merged shortlist
(ks_flat + ks_ivf candidates), one exact bf16 rows-mode rerank against
the id-indexed refine store.  Recall vs Precision.HIGHEST ground truth
(CLAUDE.md hazard #8); QPS via on-device lax.scan chains (hazard #2).

Usage: python benchmarks/exp_hybrid_zipf.py [--quick]
       (TPU job — run alone; CLAUDE.md hazard #5)
"""

from __future__ import annotations

import argparse
import functools as _ft
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
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--kmeans-iters", type=int, default=8)
    p.add_argument("--thresholds", type=str, default="1024,2048",
                   help="comma list: cells with count > T go flat")
    p.add_argument("--nprobes", type=str, default="2,4,8")
    p.add_argument("--ks-flat", type=int, default=20)
    p.add_argument("--ks-ivf", type=int, default=20)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    if args.quick:
        args.n, args.nlist = 65_536, 256
        args.thresholds, args.nprobes = "512", "4"
    n, d, b, k = args.n, args.d, args.b, args.k
    nlist = args.nlist
    n_gen_clusters = 4096
    thresholds = [int(s) for s in args.thresholds.split(",")]
    nprobes = [int(s) for s in args.nprobes.split(",")]
    ks_f, ks_i = args.ks_flat, args.ks_ivf

    def gen(key_idx, count):
        # The run10m.py --corpus zipf recipe (Zipf s=1.1 sizes +
        # lognormal spreads) — identical to the r4 SQ8 zipf table's.
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

    from c99_vectordb_tpu.models.base import list_pad
    from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_sq8_search_program
    from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
    from c99_vectordb_tpu.ops.rerank import rerank_program_rows
    from c99_vectordb_tpu.ops.topk_pallas import fused_topk

    print(f"# hybrid zipf {n} x {d} nlist={nlist} on {jax.default_backend()}",
          flush=True)
    results: dict = {"config": vars(args)}

    corpus = gen(0, n)
    refine_dev = corpus.astype(jnp.bfloat16)  # id-indexed: rows ARE ids
    queries = gen(9999, b)
    q_sq = jnp.sum(queries * queries, axis=1)

    # ---- ground truth (exact, HIGHEST precision, running k-merge — a
    # whole-corpus-wide top_k compiles pathologically on this backend) ---
    @jax.jit
    def gt_block(q, qs, x, base, best_d, best_i):
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
    blk = 131_072
    best_d = jnp.full((b, k), jnp.inf, jnp.float32)
    best_i = jnp.full((b, k), -1, jnp.int32)
    for s0 in range(0, n, blk):
        best_d, best_i = gt_block(
            queries, q_sq, corpus[s0:s0 + blk],
            jnp.int32(s0), best_d, best_i,
        )
    gt_i = np.asarray(best_i)
    print(f"ground truth done ({time.perf_counter() - t0:.1f}s)", flush=True)

    def rec(ai):
        return sum(
            len(set(ai[q].tolist()) & set(gt_i[q].tolist())) for q in range(b)
        ) / gt_i.size

    # ---- one k-means, shared across thresholds --------------------------
    t0 = time.perf_counter()
    centroids = train_kmeans(corpus, nlist, iters=args.kmeans_iters,
                             out_device=True)
    assign = np.asarray(assign_clusters(corpus, centroids, out_device=True))
    counts = np.bincount(assign, minlength=nlist)
    print(f"k-means done ({time.perf_counter() - t0:.1f}s)  "
          f"max cell {counts.max()}  mean {counts.mean():.0f}", flush=True)

    def timed_qps(step, ops, iters=4):
        @jax.jit
        def chain(qstack, *ops):
            def body(s, q):
                out_d, _ = step(q + s * 0.0, *ops)
                return s + out_d[0, 0] * 0.0 + 1.0, None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
            return s

        def run(steps):
            qstack = gen(7, steps * b).reshape(steps, b, d)
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

    ids_np = np.arange(n, dtype=np.int32)
    for thr in thresholds:
        if thr <= 0:
            # Pure flat-SQ8 exact baseline on the SAME corpus (the
            # honest competitor: the kernel is grid-step-bound, so its
            # 768-d headline number understates 384-d throughput).
            from c99_vectordb_tpu.ops.rerank import shortlist_depth

            n_pad = ((n + 2047) // 2048) * 2048
            fr = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(corpus)
            f_scale = jnp.maximum(
                jnp.max(jnp.abs(corpus), axis=0), 1e-30
            ) / 127.0
            f_codes = jnp.clip(
                jnp.rint(fr / f_scale), -127, 127
            ).astype(jnp.int8)
            f_dec = f_codes.astype(jnp.float32) * f_scale
            f_sqn = jnp.where(
                jnp.arange(n_pad) < n,
                jnp.sum(f_dec * f_dec, axis=1), jnp.inf,
            )
            f_ids = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(
                jnp.arange(n, dtype=jnp.int32)
            )
            del fr, f_dec
            ksd = shortlist_depth(k, n)
            rrf = rerank_program_rows(n, d, b, ksd, k, "bfloat16")

            def fstep(q, fc, fs, fn, fi_, ref):
                _, ci = fused_topk(fc, fi_, fn, q * fs, ksd)
                return rrf(ref, ci, ci, q)

            fops = (f_codes, f_scale, f_sqn, f_ids, refine_dev)
            _, ai = jax.jit(fstep)(queries, *fops)
            r = rec(np.asarray(ai))
            qps = timed_qps(fstep, fops)
            results["flat_sq8"] = {"qps": round(qps, 1),
                                   "recall": round(r, 4)}
            print(f"== flat_sq8 (thr=0): {qps:,.0f} QPS  "
                  f"recall@{k}={r:.4f} ==", flush=True)
            del fops, f_codes, f_sqn, f_ids
            continue
        heavy_cell = counts > thr
        hmask = heavy_cell[assign]
        n_heavy = int(hmask.sum())
        light_cells = np.nonzero(~heavy_cell)[0]
        nlist_l = len(light_cells)
        tag = f"thr{thr}"
        print(f"== {tag}: {heavy_cell.sum()} heavy cells / {n_heavy} rows "
              f"({n_heavy / n:.1%}), {nlist_l} light cells ==", flush=True)
        t0 = time.perf_counter()

        # -- heavy flat SQ8 store (padded to the 2048 kernel tile) --------
        h_idx = np.nonzero(hmask)[0].astype(np.int32)
        n_hpad = max(((n_heavy + 2047) // 2048) * 2048, 2048)
        h_rows = jnp.zeros((n_hpad, d), jnp.float32).at[:n_heavy].set(
            corpus[jnp.asarray(h_idx)]
        )
        h_scale = jnp.maximum(
            jnp.max(jnp.abs(h_rows[:n_heavy]), axis=0), 1e-30
        ) / 127.0
        h_codes = jnp.clip(
            jnp.rint(h_rows / h_scale), -127, 127
        ).astype(jnp.int8)
        h_dec = jnp.where(
            (jnp.arange(n_hpad) < n_heavy)[:, None],
            h_codes.astype(jnp.float32) * h_scale, 0.0,
        )
        h_sqn = jnp.where(
            jnp.arange(n_hpad) < n_heavy,
            jnp.sum(h_dec * h_dec, axis=1), jnp.inf,
        )
        h_ids = jnp.full((n_hpad,), -1, jnp.int32).at[:n_heavy].set(
            jnp.asarray(ids_np[h_idx])
        )
        del h_rows, h_dec

        # -- light capped IVF lists (counts <= thr by construction) -------
        cell_of = np.full(nlist, -1, np.int32)
        cell_of[light_cells] = np.arange(nlist_l, dtype=np.int32)
        l_sel = np.nonzero(~hmask)[0].astype(np.int32)
        l_assign = cell_of[assign[l_sel]]
        l_counts = np.bincount(l_assign, minlength=nlist_l)
        pad_l = list_pad(int(l_counts.max(initial=1)))
        order = np.argsort(l_assign, kind="stable")
        srt_lists = l_assign[order]
        starts = np.zeros((nlist_l,), np.int64)
        np.cumsum(l_counts[:-1], out=starts[1:])
        slots = (np.arange(len(l_sel)) - starts[srt_lists]).astype(np.int32)
        rows_sel = jnp.asarray(l_sel[order])

        # Quantize ROWS first, scatter int8: an f32 (nlist, pad, d)
        # canvas is 12.7 GB at pad 2048 and OOMs the chip (staging
        # memory rule, CLAUDE.md round 4).
        @jax.jit
        def scatter(x, rows_sel, lists, slots):
            rows = x[rows_sel]
            scale = jnp.maximum(
                jnp.max(jnp.abs(rows), axis=0), 1e-30
            ) / 127.0
            codes_r = jnp.clip(
                jnp.rint(rows / scale), -127, 127
            ).astype(jnp.int8)
            dec = codes_r.astype(jnp.float32) * scale
            dsq_r = jnp.sum(dec * dec, axis=1)
            lc = jnp.zeros((nlist_l, pad_l, d), jnp.int8).at[
                lists, slots
            ].set(codes_r)
            ld = jnp.zeros((nlist_l, pad_l), jnp.float32).at[
                lists, slots
            ].set(dsq_r)
            li = jnp.full((nlist_l, pad_l), -1, jnp.int32).at[
                lists, slots
            ].set(rows_sel.astype(jnp.int32))
            return lc, scale, ld, li

        l_codes, l_scale, l_dsq, li = scatter(
            corpus, rows_sel,
            jnp.asarray(srt_lists.astype(np.int32)),
            jnp.asarray(slots))
        cents_l = centroids[jnp.asarray(light_cells.astype(np.int32))]
        csq_l = jnp.sum(cents_l * cents_l, axis=1)
        build_s = time.perf_counter() - t0
        entry: dict = {
            "build_s": round(build_s, 1),
            "heavy_rows": n_heavy,
            "heavy_frac": round(n_heavy / n, 4),
            "nlist_light": nlist_l,
            "pad_light": int(pad_l),
        }
        print(f"staged ({build_s:.1f}s)  pad_l={pad_l}", flush=True)

        for nprobe in nprobes:
            prog = ivf_sq8_search_program(
                nlist_l, pad_l, d, b, min(nprobe, nlist_l), ks_i
            )
            rr = rerank_program_rows(n, d, b, ks_f + ks_i, k, "bfloat16")

            def step(q, hc, hs, hn, hi_, cl, cs, lc, ls, ld, lli, ref):
                _, fi = fused_topk(hc, hi_, hn, q * hs, ks_f)
                _, si, _ = prog(cl, cs, lc, ls, ld, lli, q)
                cat = jnp.concatenate([fi, si], axis=1)
                # refine is id-indexed (rows ARE ids): rows-mode rerank,
                # no id->row gather; -1 ids stay invalid by contract.
                return rr(ref, cat, cat, q)

            ops = (h_codes, h_scale, h_sqn, h_ids, cents_l, csq_l,
                   l_codes, l_scale, l_dsq, li, refine_dev)
            _, ai = jax.jit(step)(queries, *ops)
            r = rec(np.asarray(ai))
            qps = timed_qps(step, ops)
            entry[f"p{nprobe}"] = {"qps": round(qps, 1),
                                   "recall": round(r, 4)}
            print(f"  p={nprobe}: {qps:,.0f} QPS  recall@{k}={r:.4f}",
                  flush=True)
            del ops
        results[tag] = entry
        del h_codes, h_sqn, h_ids, l_codes, l_dsq, li, cents_l

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
