"""Full benchmark harness — produces the BASELINE.md measurement table.

Covers the BASELINE.json configs:
  - Flat exact (f32) QPS + recall (==1.0 by construction, it's the GT)
  - Flat bf16-storage QPS + recall@k vs exact
  - IVF-Flat: build time, QPS/recall across an nprobe sweep
  - IVF-PQ: train+encode time, code memory, QPS/recall across nprobe
  - CPU brute-force baseline (torch) for the vs-CPU column

Design constraints of the measurement environment (see bench.py and the
repo memory): host<->device transfers run at ~MB/s through the tunnel, so
EVERYTHING at corpus scale stays device-resident (corpus generated on
device, k-means trained on device arrays, inverted lists scattered on
device); only KB..MB-scale index metadata crosses the boundary. Timing
uses on-device lax.scan chains (host-side timing over-reports).

Usage:
    python benchmarks/run.py                   # 1M x 768 on TPU
    python benchmarks/run.py --quick           # small CPU-friendly config
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed_scan_qps(search_step, operands, qstack_maker, b: int, iters: int) -> float:
    """QPS via two on-device scan chains of different lengths.

    `operands` (the index arrays) are passed as RUNTIME ARGUMENTS, never
    closed over: closures bake device arrays into the compiled program as
    constants, which a remote-compile backend must serialize through the
    compile RPC (a 3GB corpus kills it)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = search_step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def timed(steps: int) -> float:
        qstack = qstack_maker(steps)
        float(chain(qstack, *operands))  # compile + warm
        t0 = time.perf_counter()
        float(chain(qstack, *operands))
        return time.perf_counter() - t0

    # Grow the long chain until the two-point DELTA is macroscopic:
    # relative growth alone (>1.5x) still let ms-scale deltas drown in
    # this relay's window noise — BENCH_r03's +-60% spread (bench.py
    # round-4 protocol, applied here too).
    lo = 2
    hi = 2 + iters
    t_lo = timed(lo)
    while True:
        t_hi = timed(hi)
        if (t_hi > 1.5 * t_lo and t_hi - t_lo >= 0.5) or hi >= 512:
            break
        hi *= 4
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def recall_at_k(approx_ids: np.ndarray, exact_ids: np.ndarray) -> float:
    hits = sum(
        len(set(approx_ids[q].tolist()) & set(exact_ids[q].tolist()))
        for q in range(exact_ids.shape[0])
    )
    return hits / exact_ids.size


def next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_048_576)
    parser.add_argument("--d", type=int, default=768)
    parser.add_argument("--b", type=int, default=128)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--kmeans-iters", type=int, default=8)
    parser.add_argument("--nlist", type=int, default=4096)
    parser.add_argument("--pq-m", type=int, default=96)
    parser.add_argument("--nprobe-sweep", type=int, nargs="+", default=[1, 4, 16, 64])
    parser.add_argument(
        "--corpus",
        choices=["random", "clustered"],
        default="clustered",
        help="clustered = balanced Gaussian mixture (realistic IVF recall); "
        "random = iid Gaussian (worst case for IVF, exact-search stress)",
    )
    parser.add_argument("--quick", action="store_true", help="small config")
    parser.add_argument("--skip-cpu", action="store_true")
    parser.add_argument("--skip-pq", action="store_true")
    parser.add_argument("--json-out", type=str, default=None)
    args = parser.parse_args()

    from c99_vectordb_tpu.utils.runtime import configure_jax_cache

    configure_jax_cache()

    import jax
    import jax.numpy as jnp

    from c99_vectordb_tpu.ops.kmeans import (
        assign_clusters,
        assign_clusters_multi,
        train_kmeans,
        train_kmeans_multi,
    )
    from c99_vectordb_tpu.models.base import list_pad

    if args.quick:
        args.n, args.d, args.b, args.nlist, args.pq_m = 16_384, 128, 16, 64, 16
        args.iters = 2
        args.nprobe_sweep = [1, 4, 16]

    on_tpu = jax.default_backend() == "tpu"
    # multiple of the kernel tile AND the k-means chunk => zero pad copies
    n = ((args.n + 2047) // 2048) * 2048
    d, b, k = args.d, args.b, args.k
    results: dict = {
        "config": {"n": n, "d": d, "b": b, "k": k, "backend": jax.default_backend()}
    }

    print(
        f"# corpus {n} x {d} ({args.corpus}), batch {b}, k {k} "
        f"on {jax.default_backend()}",
        flush=True,
    )
    n_gen_clusters = min(4096, max(64, n // 256))

    @jax.jit
    def gen_points(key_idx, count_marker):
        """Sample `count` mixture points: center + noise (clustered) or iid."""
        count = count_marker.shape[0]
        kc, kn = jax.random.split(jax.random.key(key_idx))
        if args.corpus == "clustered":
            centers = jax.random.normal(
                jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
            )
            cid = jax.random.randint(kc, (count,), 0, n_gen_clusters)
            return centers[cid] * 3.0 + jax.random.normal(
                kn, (count, d), dtype=jnp.float32
            )
        return jax.random.normal(kn, (count, d), dtype=jnp.float32)

    db = gen_points(0, jnp.zeros((n,)))
    sq_norms = jnp.sum(db * db, axis=1)
    ids_dev = jnp.arange(n, dtype=jnp.int32)
    float(jnp.sum(sq_norms))

    def make_qstack(steps: int):
        return gen_points(7, jnp.zeros((steps * b,))).reshape(steps, b, d)

    eval_q_dev = gen_points(9, jnp.zeros((b,)))

    # ---- exact search step (f32) = ground truth -------------------------
    # All index arrays are runtime arguments (never closure constants).
    if on_tpu:
        from c99_vectordb_tpu.ops.topk_pallas import fused_topk

        def flat_step(q, _db, _ids, _sq):
            return fused_topk(_db, _ids, _sq, q, k)
    else:
        from c99_vectordb_tpu.ops.distances import scores_via_matmul

        def flat_step(q, _db, _ids, _sq):
            dists = scores_via_matmul(q, _db.astype(jnp.float32), _sq)
            neg, rows = jax.lax.top_k(-dists, k)
            return -neg, _ids[rows]

    flat_ops = (db, ids_dev, sq_norms)

    # ---- TRUE ground truth: HIGHEST-precision chunked scan ----------------
    # DEFAULT TPU matmul precision multiplies in bf16 (distance noise
    # sigma~1 at 768-d), which silently corrupts the GT itself — measured
    # 0.978 agreement with the true f32 ranking (exp_precision.py). The GT
    # must therefore run at Precision.HIGHEST.
    @jax.jit
    def gt_scan(_db, _sq, q):
        q_sq = jnp.sum(q * q, axis=1)
        chunks = _db.reshape(n // 2048, 2048, d)
        sq_chunks = _sq.reshape(n // 2048, 2048)

        def step(carry, inp):
            best_d, best_i = carry
            block, block_sq, idx = inp
            ip = jax.lax.dot_general(
                q, block.T, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            dist = block_sq[None, :] - 2.0 * ip + q_sq[:, None]
            bids = idx * 2048 + jnp.arange(2048, dtype=jnp.int32)
            alld = jnp.concatenate([best_d, dist], axis=1)
            alli = jnp.concatenate(
                [best_i, jnp.broadcast_to(bids, (b, 2048))], axis=1
            )
            neg, pos = jax.lax.top_k(-alld, k)
            return (-neg, jnp.take_along_axis(alli, pos, axis=1)), None

        init = (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(
            step, init,
            (chunks, sq_chunks, jnp.arange(n // 2048, dtype=jnp.int32)),
        )
        return bd, bi

    _, gt_i_dev = gt_scan(db, sq_norms, eval_q_dev)
    gt_i = np.asarray(gt_i_dev)

    # Raw scan kernel accuracy (diagnostic: bf16-multiply noise vs true GT)
    _, raw_i = jax.jit(flat_step)(eval_q_dev, *flat_ops)
    raw_rec = recall_at_k(np.asarray(raw_i), gt_i)

    # Product path: kernel shortlist + exact f32 rerank (ops/rerank.py)
    from c99_vectordb_tpu.ops.rerank import (
        rerank_program, rerank_program_rows, shortlist_depth,
    )

    k_slack = shortlist_depth(k, n)
    if on_tpu:
        from c99_vectordb_tpu.ops.topk_pallas import fused_topk as _ft

        def flat_exact_step(q, _db, _ids, _sq):
            _, ci = _ft(_db, _ids, _sq, q, k_slack)
            # ids are iota: rows-mode rerank (the id->row table gather
            # costs as much as the row gather itself — round 3)
            return rerank_program_rows(n, d, b, k_slack, k, "float32")(
                _db, ci, ci, q
            )

        _, ei = jax.jit(flat_exact_step)(eval_q_dev, *flat_ops)
        exact_rec = recall_at_k(np.asarray(ei), gt_i)
        headline_step = flat_exact_step  # the real product path
    else:
        exact_rec = 1.0
        headline_step = flat_step
    flat_qps = timed_scan_qps(headline_step, flat_ops, make_qstack, b, args.iters)
    results["flat_f32"] = {
        "qps": round(flat_qps, 1),
        "recall": round(exact_rec, 4),
        "raw_kernel_recall": round(raw_rec, 4),
        "rerank_depth": k_slack if on_tpu else None,
    }
    print(
        f"flat f32        qps={flat_qps:,.0f}  recall@{k}={exact_rec:.3f} "
        f"(raw kernel, no rerank: {raw_rec:.3f})",
        flush=True,
    )

    # ---- bf16-storage flat ------------------------------------------------
    if on_tpu:
        db16 = db.astype(jnp.bfloat16)
        bf16_ops = (db16, ids_dev, sq_norms)
        _, i16 = jax.jit(flat_step)(eval_q_dev, *bf16_ops)
        r16 = recall_at_k(np.asarray(i16), gt_i)
        qps16 = timed_scan_qps(flat_step, bf16_ops, make_qstack, b, args.iters)
        results["flat_bf16"] = {"qps": round(qps16, 1), "recall": round(r16, 4)}
        print(f"flat bf16       qps={qps16:,.0f}  recall@{k}={r16:.3f}", flush=True)

        # -- bf16 SCAN + f32 rerank: the scan (HBM-bound at B=128) reads
        #    half the bytes; the rerank gathers k_slack rows from the f32
        #    corpus and restores the exact order. Memory 1.5x, speed ~2x,
        #    exactness preserved.
        def bf16_scan_f32_rerank(q, _db16, _db32, _ids, _sq):
            _, ci = _ft(_db16, _ids, _sq, q, k_slack)
            return rerank_program_rows(n, d, b, k_slack, k, "float32")(
                _db32, ci, ci, q
            )

        mixed_ops = (db16, db, ids_dev, sq_norms)
        _, mi = jax.jit(bf16_scan_f32_rerank)(eval_q_dev, *mixed_ops)
        mrec = recall_at_k(np.asarray(mi), gt_i)
        mqps = timed_scan_qps(
            bf16_scan_f32_rerank, mixed_ops, make_qstack, b, args.iters
        )
        results["flat_bf16_scan_f32_rerank"] = {
            "qps": round(mqps, 1), "recall": round(mrec, 4)
        }
        print(
            f"flat bf16+rr32  qps={mqps:,.0f}  recall@{k}={mrec:.3f}", flush=True
        )

        # -- bf16 scan + rerank from the SAME bf16 store (no extra memory):
        #    removes multiply noise, keeps storage rounding.
        def bf16_scan_bf16_rerank(q, _db16, _ids, _sq):
            _, ci = _ft(_db16, _ids, _sq, q, k_slack)
            return rerank_program_rows(n, d, b, k_slack, k, "bfloat16")(
                _db16, ci, ci, q
            )

        _, bi = jax.jit(bf16_scan_bf16_rerank)(eval_q_dev, *bf16_ops)
        brec = recall_at_k(np.asarray(bi), gt_i)
        bqps = timed_scan_qps(
            bf16_scan_bf16_rerank, bf16_ops, make_qstack, b, args.iters
        )
        results["flat_bf16_self_rerank"] = {
            "qps": round(bqps, 1), "recall": round(brec, 4)
        }
        print(
            f"flat bf16+rr16  qps={bqps:,.0f}  recall@{k}={brec:.3f}", flush=True
        )

        # -- int8 SQ8 scan + f32 rerank (FlatIndex scan_dtype="int8"):
        #    symmetric per-dim scalar quantization; 4x less scan HBM than
        #    f32 at 1.25x total memory; exact after the f32 rerank.
        @jax.jit
        def sq8_stage(_db):
            scale = jnp.max(jnp.abs(_db), axis=0) / 127.0
            codes = jnp.clip(jnp.round(_db / scale), -127, 127).astype(jnp.int8)
            dec_sq = jnp.sum(
                (codes.astype(jnp.float32) * scale) ** 2, axis=1
            )
            return scale, codes, dec_sq

        sq8_scale, sq8_codes, sq8_norms = sq8_stage(db)

        def sq8_scan_f32_rerank(q, _codes, _scale, _db32, _ids, _dsq):
            _, ci = _ft(_codes, _ids, _dsq, q * _scale, k_slack)
            # ids are iota: rows-mode rerank (the id->row table gather
            # costs as much as the row gather itself — round 3).
            return rerank_program_rows(n, d, b, k_slack, k, "float32")(
                _db32, ci, ci, q
            )

        sq8_ops = (sq8_codes, sq8_scale, db, ids_dev, sq8_norms)
        _, si = jax.jit(sq8_scan_f32_rerank)(eval_q_dev, *sq8_ops)
        srec = recall_at_k(np.asarray(si), gt_i)
        sqps = timed_scan_qps(
            sq8_scan_f32_rerank, sq8_ops, make_qstack, b, args.iters
        )
        results["flat_int8_scan_f32_rerank"] = {
            "qps": round(sqps, 1), "recall": round(srec, 4)
        }
        print(
            f"flat sq8+rr32   qps={sqps:,.0f}  recall@{k}={srec:.3f}", flush=True
        )
        # Free EVERYTHING holding a corpus reference (the operand TUPLES
        # keep arrays alive — deleting only the names leaks 3GB+ each).
        del db16, bf16_ops, mixed_ops, flat_ops, headline_step
        del sq8_codes, sq8_ops

    # ---- coarse quantizer (shared by IVF-Flat and IVF-PQ) -----------------
    nlist = min(args.nlist, n)
    t0 = time.perf_counter()
    centroids_d = train_kmeans(
        db, nlist, iters=args.kmeans_iters, out_device=True
    )
    assign_d = assign_clusters(db, centroids_d, out_device=True)
    assign = np.asarray(assign_d)  # (n,) int32 — small D2H
    coarse_s = time.perf_counter() - t0
    c_sq_d = jnp.sum(centroids_d * centroids_d, axis=1)
    print(f"coarse kmeans   {coarse_s:.1f}s (nlist={nlist})", flush=True)

    # Host-side bucketing metadata (small), device-side scatters (big).
    counts = np.bincount(assign, minlength=nlist)
    pad = list_pad(int(counts.max(initial=1)))
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    starts = np.zeros((nlist,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(n) - starts[sorted_lists]).astype(np.int32)
    order_d = jnp.asarray(order)
    lists_d = jnp.asarray(sorted_lists)
    slots_d = jnp.asarray(slots)

    @jax.jit
    def scatter_ids(ids, order, lists, slots):
        return (
            jnp.full((nlist, pad), -1, jnp.int32).at[lists, slots].set(ids[order])
        )

    list_ids_d = scatter_ids(ids_dev, order_d, lists_d, slots_d)

    # Phase ordering note: every timed sweep runs with the MINIMUM set of
    # live device buffers. Measured effect (exp_rerank3.py vs an earlier
    # ordering that kept PQ staging alive through the IVF sweeps): the
    # composed ivf+rerank p=1 step degraded ~5x under the extra residency.
    # The corpus itself is regenerated on device (deterministic key) when
    # a later phase needs it rather than hoarded across phases.
    do_pq = not args.skip_pq and d % args.pq_m == 0

    # ---- IVF-Flat staging (then the raw corpus can be dropped) ------------
    t0 = time.perf_counter()

    @jax.jit
    def scatter_vecs(_db, order, lists, slots):
        return (
            jnp.zeros((nlist, pad, d), jnp.float32).at[lists, slots]
            .set(_db[order])
        )

    list_vecs_d = scatter_vecs(db, order_d, lists_d, slots_d)
    list_sqn_d = jax.jit(lambda v: jnp.sum(v * v, axis=-1))(list_vecs_d)
    float(jnp.sum(list_vecs_d[0, 0]))
    stage_s = time.perf_counter() - t0
    results["ivf_flat"] = {
        "build_s": round(coarse_s + stage_s, 1),
        "nlist": nlist,
        "pad": pad,
        "sweep": {},
    }
    print(f"ivf_flat build  {coarse_s + stage_s:.1f}s (pad={pad})", flush=True)
    del sq_norms, flat_step  # db is dropped after the rerank sweeps and
    # regenerated (same key) for the PQ phase — minimum live buffers per phase

    # ---- IVF-Flat sweep ------------------------------------------------------
    from c99_vectordb_tpu.models.ivf_flat import _ivf_search_program

    if on_tpu:
        from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_full_search_program

        ivf_ops = (centroids_d, c_sq_d, list_vecs_d, list_sqn_d, list_ids_d)
        # The PRODUCT path (models/ivf_flat.py): exact Precision.HIGHEST
        # scoring, dense variant below the measured ~4096-candidate
        # crossover, in-kernel selection above it.
        make_ivf_program = lambda nprobe: ivf_full_search_program(  # noqa: E731
            nlist, pad, d, b, nprobe, k, exact=True,
            dense=nprobe * pad <= 4096,
        )
    else:
        ivf_ops = (centroids_d, c_sq_d, list_vecs_d, list_ids_d)
        make_ivf_program = lambda nprobe: _ivf_search_program(  # noqa: E731
            nlist, pad, d, b, nprobe, k
        )
    for nprobe in args.nprobe_sweep:
        nprobe = min(nprobe, nlist)
        program = make_ivf_program(nprobe)

        def ivf_step(q, *ops, _p=program):
            return _p(*ops, q)

        _, ai = program(*ivf_ops, eval_q_dev)
        rec = recall_at_k(np.asarray(ai), gt_i)
        qps = timed_scan_qps(ivf_step, ivf_ops, make_qstack, b, args.iters)
        results["ivf_flat"]["sweep"][nprobe] = {
            "qps": round(qps, 1), "recall": round(rec, 4)
        }
        print(f"ivf_flat p={nprobe:<4d} qps={qps:,.0f}  recall@{k}={rec:.3f}", flush=True)

    # -- IVF-Flat + exact rerank (the product path on TPU: restores the
    #    f32 order the kernel's bf16 multiplies perturb) -------------------
    if on_tpu:
        row_of_pos_ivf = np.zeros((n,), np.int32)
        row_of_pos_ivf[order] = (sorted_lists.astype(np.int64) * pad + slots).astype(
            np.int32
        )
        rr_ops = (jnp.asarray(row_of_pos_ivf),)
        results["ivf_flat_rerank"] = {"sweep": {}}
        for nprobe in [args.nprobe_sweep[0], args.nprobe_sweep[-1]]:
            nprobe = min(nprobe, nlist)
            scan_p = ivf_full_search_program(nlist, pad, d, b, nprobe, k_slack)
            rr_p = rerank_program(nlist * pad, d, n, b, k_slack, k, "float32")

            def ivf_exact_step(q, cents, csq, lv, lsq, lids, rop, _s=scan_p, _r=rr_p):
                _, ci = _s(cents, csq, lv, lsq, lids, q)
                # ids are iota, so row_of_pos_ivf doubles as id->bucket-row
                return _r(lv.reshape(nlist * pad, d), rop, ci, q)

            ops2 = ivf_ops + rr_ops
            _, ai = jax.jit(ivf_exact_step)(eval_q_dev, *ops2)
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(ivf_exact_step, ops2, make_qstack, b, args.iters)
            results["ivf_flat_rerank"]["sweep"][nprobe] = {
                "qps": round(qps, 1), "recall": round(rec, 4)
            }
            print(
                f"ivf_flat+rr p={nprobe:<2d} qps={qps:,.0f}  recall@{k}={rec:.3f}",
                flush=True,
            )
            del ops2

        # -- SQ8 inverted lists: int8 MXU dense scan + exact f32 rerank
        #    (IVFFlatIndex(scan_dtype="int8") — the overall QPS headline)
        from c99_vectordb_tpu.models.ivf_flat import _sq8_stage
        from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_sq8_search_program
        from c99_vectordb_tpu.ops.rerank import shortlist_depth

        # the PRODUCT quantizer (models/ivf_flat.py), not a local copy
        sq8_codes, sq8_scale, sq8_dsq = _sq8_stage(list_vecs_d, list_ids_d)
        float(jnp.sum(sq8_scale))
        ks_sq8 = shortlist_depth(k, n)
        results["ivf_sq8_rerank"] = {"sweep": {}}
        for nprobe in dict.fromkeys(
            min(p_, nlist) for p_ in (args.nprobe_sweep[0], 4)
        ):
            sq8_p = ivf_sq8_search_program(nlist, pad, d, b, nprobe, ks_sq8)
            rr_p = rerank_program_rows(nlist * pad, d, b, ks_sq8, k, "float32")

            def ivf_sq8_step(q, cents, csq, lv, lsq, lids, cod, sc, dsq, rop,
                             _s=sq8_p, _r=rr_p):
                _, ci, crows = _s(cents, csq, cod, sc, dsq, lids, q)
                return _r(lv.reshape(nlist * pad, d), crows, ci, q)

            ops3 = ivf_ops + (sq8_codes, sq8_scale, sq8_dsq, rr_ops[0])
            _, ai = jax.jit(ivf_sq8_step)(eval_q_dev, *ops3)
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(ivf_sq8_step, ops3, make_qstack, b, args.iters)
            results["ivf_sq8_rerank"]["sweep"][nprobe] = {
                "qps": round(qps, 1), "recall": round(rec, 4)
            }
            print(
                f"ivf_sq8+rr p={nprobe:<2d} qps={qps:,.0f}  recall@{k}={rec:.3f}",
                flush=True,
            )
            del ops3
        del rr_ops, sq8_codes, sq8_scale, sq8_dsq

    # ---- bf16 inverted lists: halves the scan's HBM traffic ----------------
    if on_tpu:
        del db, ivf_ops  # ivf_ops tuple also references list_vecs_d
        list_vecs16 = jax.jit(lambda v: v.astype(jnp.bfloat16))(list_vecs_d)
        float(jnp.sum(list_vecs16[0, 0].astype(jnp.float32)))
        del list_vecs_d
        ivf16_ops = (centroids_d, c_sq_d, list_vecs16, list_sqn_d, list_ids_d)
        results["ivf_flat_bf16"] = {"sweep": {}}
        for nprobe in args.nprobe_sweep[-2:]:
            nprobe = min(nprobe, nlist)
            program = ivf_full_search_program(nlist, pad, d, b, nprobe, k)

            def ivf16_step(q, *ops, _p=program):
                return _p(*ops, q)

            _, ai = program(*ivf16_ops, eval_q_dev)
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(ivf16_step, ivf16_ops, make_qstack, b, args.iters)
            results["ivf_flat_bf16"]["sweep"][nprobe] = {
                "qps": round(qps, 1), "recall": round(rec, 4)
            }
            print(
                f"ivf16   p={nprobe:<4d} qps={qps:,.0f}  recall@{k}={rec:.3f}",
                flush=True,
            )
        del list_vecs16, ivf16_ops
        db = gen_points(0, jnp.zeros((n,)))  # deterministic regeneration
        float(jnp.sum(db[0]))

    # ---- IVF-PQ build ------------------------------------------------------
    if do_pq:
        m, dsub = args.pq_m, d // args.pq_m
        t0 = time.perf_counter()

        @jax.jit
        def make_subs(_db, _cents, _assign):
            residuals = _db - _cents[_assign]
            return residuals.reshape(n, m, dsub).transpose(1, 0, 2)

        subs = make_subs(db, centroids_d, assign_d)
        books_d = train_kmeans_multi(
            subs, 256, iters=args.kmeans_iters, out_device=True
        )
        codes_d = assign_clusters_multi(subs, books_d, out_device=True)
        del subs

        @jax.jit
        def scatter_codes(codes, order, lists, slots):
            by_row = codes.astype(jnp.uint8).T  # (n, m)
            return (
                jnp.zeros((nlist, pad, m), jnp.uint8).at[lists, slots]
                .set(by_row[order])
            )

        list_codes_d = scatter_codes(codes_d, order_d, lists_d, slots_d)
        float(jnp.sum(list_codes_d.astype(jnp.int32)[0, 0]))
        if on_tpu:
            # Host-side per-item ADC constant for the Pallas kernel (a ~m*n
            # numpy pass; only codes (~n*m uint8) cross the device boundary).
            from c99_vectordb_tpu.ops.adc_pallas import build_item_constants

            codes_host = np.asarray(codes_d).T.astype(np.uint8)
            pq_item_const = build_item_constants(
                np.asarray(centroids_d), assign, codes_host, np.asarray(books_d),
                order, sorted_lists, slots, nlist, pad,
            )
        pq_build_s = time.perf_counter() - t0
        del codes_d
        results["ivf_pq"] = {
            "build_s": round(pq_build_s + coarse_s, 1),
            "m": m,
            "code_mb": round(n * m / 1e6, 1),
            "sweep": {},
        }
        print(
            f"ivf_pq build    {pq_build_s + coarse_s:.1f}s (m={m}, codes "
            f"{n * m / 1e6:.0f} MB vs raw {n * d * 4 / 1e6:.0f} MB)",
            flush=True,
        )

    # ---- IVF-PQ sweep -----------------------------------------------------------
    if do_pq:
        from c99_vectordb_tpu.models.ivf_pq import _adc_search_program

        if on_tpu:
            # Pallas ADC path: codes padded to 128 subspace lanes + the
            # host-built per-item constant (see ops/adc_pallas.py).
            from c99_vectordb_tpu.ops.adc_pallas import (
                CODE_LANES,
                adc_full_search_program,
            )

            codes128_d = jax.jit(
                lambda c: jnp.pad(
                    c.transpose(0, 2, 1),
                    ((0, 0), (0, CODE_LANES - args.pq_m), (0, 0)),
                )
            )(list_codes_d)
            item_const_d = jnp.asarray(pq_item_const)
            pq_ops = (
                centroids_d, c_sq_d, books_d, codes128_d, item_const_d, list_ids_d
            )
            make_pq_program = lambda nprobe, kk: adc_full_search_program(  # noqa: E731
                nlist, pad, d, args.pq_m, 256, b, nprobe, kk
            )
        else:
            pq_ops = (centroids_d, c_sq_d, books_d, list_codes_d, list_ids_d)
            make_pq_program = lambda nprobe, kk: _adc_search_program(  # noqa: E731
                nlist, pad, d, args.pq_m, 256, b, nprobe, kk
            )
        for nprobe in args.nprobe_sweep:
            nprobe = min(nprobe, nlist)
            program = make_pq_program(nprobe, k)

            def pq_step(q, *ops, _p=program):
                return _p(*ops, q)

            _, ai = program(*pq_ops, eval_q_dev)
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(pq_step, pq_ops, make_qstack, b, args.iters)
            results["ivf_pq"]["sweep"][nprobe] = {
                "qps": round(qps, 1), "recall": round(rec, 4)
            }
            print(f"ivf_pq  p={nprobe:<4d} qps={qps:,.0f}  recall@{k}={rec:.3f}", flush=True)

        # -- refined PQ: deep ADC shortlist exactly re-ranked on device.
        # The rerank is elementwise f32 (no MXU noise), so its recall is
        # bounded only by shortlist coverage — sweep depth to find the
        # >=0.99 strict-recall operating point vs the TRUE f32 GT.
        from c99_vectordb_tpu.ops.topk import merge_topk

        refine_probe = min(args.nprobe_sweep[0], nlist)
        if on_tpu:
            # Deep shortlists skip in-kernel selection entirely: dense ADC
            # output + XLA top_k (adc_dense_search_program) — the sorted-
            # insertion top-k costs ~k_adc VPU rounds per probe otherwise.
            from c99_vectordb_tpu.ops.adc_pallas import adc_dense_search_program

            make_pq_program = lambda nprobe, kk: adc_dense_search_program(  # noqa: E731
                nlist, pad, d, args.pq_m, 256, b, nprobe, kk
            )
        results["ivf_pq"]["refined"] = {}
        for k_adc in (4 * k, 10 * k, 20 * k):
            adc_wide = make_pq_program(refine_probe, k_adc)

            def refined_step(q, _db, *ops, _p=adc_wide):
                cd, ci = _p(*ops, q)
                vecs = _db[jnp.maximum(ci, 0)]
                exact = jnp.sum((vecs - q[:, None, :]) ** 2, axis=-1)
                exact = jnp.where(ci >= 0, exact, jnp.inf)
                return merge_topk(exact, ci, k)

            refined_ops = (db,) + pq_ops
            _, ai = jax.jit(refined_step)(eval_q_dev, *refined_ops)
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(
                refined_step, refined_ops, make_qstack, b, args.iters
            )
            results["ivf_pq"]["refined"][k_adc] = {
                "nprobe": refine_probe, "k_adc": k_adc,
                "qps": round(qps, 1), "recall": round(rec, 4),
            }
            print(
                f"ivf_pq refined (p={refine_probe}, top{k_adc} rerank) "
                f"qps={qps:,.0f}  recall@{k}={rec:.3f}",
                flush=True,
            )

        # -- bf16 refine store: halves the refine memory (IVFPQIndex
        #    refine_dtype="bfloat16"); measures the recall cost of storing
        #    the rerank vectors rounded to bf16.
        db16 = jax.jit(lambda x: x.astype(jnp.bfloat16))(db)
        float(jnp.sum(db16[0].astype(jnp.float32)))
        adc_deep = make_pq_program(refine_probe, 20 * k)

        def refined16_step(q, _db16, *ops, _p=adc_deep):
            cd, ci = _p(*ops, q)
            vecs = _db16[jnp.maximum(ci, 0)].astype(jnp.float32)
            exact = jnp.sum((vecs - q[:, None, :]) ** 2, axis=-1)
            exact = jnp.where(ci >= 0, exact, jnp.inf)
            return merge_topk(exact, ci, k)

        refined16_ops = (db16,) + pq_ops
        _, ai = jax.jit(refined16_step)(eval_q_dev, *refined16_ops)
        rec = recall_at_k(np.asarray(ai), gt_i)
        qps = timed_scan_qps(refined16_step, refined16_ops, make_qstack, b, args.iters)
        results["ivf_pq"]["refined_bf16"] = {
            "nprobe": refine_probe, "k_adc": 20 * k,
            "qps": round(qps, 1), "recall": round(rec, 4),
        }
        print(
            f"ivf_pq refined-bf16 (p={refine_probe}, top{20 * k}) "
            f"qps={qps:,.0f}  recall@{k}={rec:.3f}",
            flush=True,
        )
        del db16, refined16_ops

    # ---- CPU baseline ------------------------------------------------------------
    if not args.skip_cpu:
        import torch

        base_n = min(n, 262_144)
        torch.manual_seed(0)
        tdb = torch.randn(base_n, d)
        tsq = (tdb * tdb).sum(1)
        tq = torch.randn(b, d)

        def cpu_run():
            scores = tsq[None, :] - 2.0 * (tq @ tdb.T)
            return torch.topk(scores, k, dim=1, largest=False)

        cpu_run()
        t0 = time.perf_counter()
        for _ in range(3):
            cpu_run()
        cpu_qps = b * 3 / (time.perf_counter() - t0) * (base_n / n)
        results["cpu_bruteforce"] = {"qps": round(cpu_qps, 1)}
        print(f"cpu baseline    qps={cpu_qps:,.1f} (torch brute force, scaled)", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
