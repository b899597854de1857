"""Full benchmark harness — produces the BASELINE.md measurement table.

Covers the BASELINE.json configs:
  - Flat exact (f32) QPS + recall (==1.0 by construction, it's the GT)
  - Flat bf16-storage QPS + recall@k vs exact
  - IVF-Flat: build time, QPS/recall across an nprobe sweep
  - IVF-PQ: train+encode time, code memory, QPS/recall across nprobe
  - CPU brute-force baseline (torch) for the vs-CPU column

Timing uses the same on-device lax.scan chain methodology as bench.py
(remote-dispatch backends make host-side timing unreliable); build times
are honest wall-clock including host<->device traffic.

Usage:
    python benchmarks/run.py --n 1000000 --d 768 --b 128 --k 10
    python benchmarks/run.py --quick          # small CPU-friendly config
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed_scan_qps(search_step, qstack_maker, b: int, iters: int) -> float:
    """QPS via two on-device scan chains of different lengths."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(qstack):
        def body(s, q):
            out_d, _ = search_step(q + s * 0.0)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def timed(steps: int) -> float:
        qstack = qstack_maker(steps)
        float(chain(qstack))  # compile + warm
        t0 = time.perf_counter()
        float(chain(qstack))
        return time.perf_counter() - t0

    # Grow the long chain until per-step cost dominates dispatch noise —
    # fast configs (e.g. nprobe=1 on a small corpus) need more steps.
    lo = 2
    hi = 2 + iters
    t_lo = timed(lo)
    while True:
        t_hi = timed(hi)
        if t_hi > 1.5 * t_lo or hi >= 512:
            break
        hi *= 4
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def recall_at_k(approx_ids: np.ndarray, exact_ids: np.ndarray) -> float:
    hits = sum(
        len(set(approx_ids[q].tolist()) & set(exact_ids[q].tolist()))
        for q in range(exact_ids.shape[0])
    )
    return hits / exact_ids.size


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=768)
    parser.add_argument("--b", type=int, default=128)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--nlist", type=int, default=4096)
    parser.add_argument("--pq-m", type=int, default=96)
    parser.add_argument("--nprobe-sweep", type=int, nargs="+", default=[1, 4, 16, 64])
    parser.add_argument("--quick", action="store_true", help="small CPU-friendly config")
    parser.add_argument("--skip-cpu", action="store_true")
    parser.add_argument("--json-out", type=str, default=None)
    args = parser.parse_args()

    from c99_vectordb_tpu.utils.runtime import configure_jax_cache

    configure_jax_cache()

    import jax
    import jax.numpy as jnp

    if args.quick:
        args.n, args.d, args.b, args.nlist, args.pq_m = 16_384, 128, 16, 64, 16
        args.iters = 2
        args.nprobe_sweep = [1, 4, 16]

    on_tpu = jax.default_backend() == "tpu"
    n = ((args.n + 1023) // 1024) * 1024
    d, b, k = args.d, args.b, args.k
    results: dict = {"config": {"n": n, "d": d, "b": b, "k": k, "backend": jax.default_backend()}}

    print(f"# corpus {n} x {d}, batch {b}, k {k} on {jax.default_backend()}", flush=True)
    db = jax.random.normal(jax.random.key(0), (n, d), dtype=jnp.float32)
    sq_norms = jnp.sum(db * db, axis=1)
    ids_dev = jnp.arange(n, dtype=jnp.int32)
    float(jnp.sum(sq_norms))

    def make_qstack(steps: int):
        return jax.random.normal(jax.random.key(7), (steps, b, d), dtype=jnp.float32)

    eval_queries = np.asarray(
        jax.random.normal(jax.random.key(9), (b, d), dtype=jnp.float32)
    )

    # ---- exact search step (f32) = ground truth -------------------------
    if on_tpu:
        from c99_vectordb_tpu.ops.topk_pallas import fused_topk

        def flat_step(q, _db=db):
            return fused_topk(_db, ids_dev, sq_norms, q, k)
    else:
        from c99_vectordb_tpu.ops.distances import scores_via_matmul

        def flat_step(q, _db=db):
            dists = scores_via_matmul(q, _db.astype(jnp.float32), sq_norms)
            neg, rows = jax.lax.top_k(-dists, k)
            return -neg, ids_dev[rows]

    gt_d, gt_i = jax.jit(flat_step)(jnp.asarray(eval_queries))
    gt_i = np.asarray(gt_i)
    flat_qps = timed_scan_qps(flat_step, make_qstack, b, args.iters)
    results["flat_f32"] = {"qps": round(flat_qps, 1), "recall": 1.0}
    print(f"flat f32        qps={flat_qps:,.0f}  recall@{k}=1.000", flush=True)

    # ---- bf16-storage flat ------------------------------------------------
    if on_tpu:
        db16 = db.astype(jnp.bfloat16)

        def flat16_step(q):
            return flat_step(q, _db=db16)

        d16, i16 = jax.jit(flat16_step)(jnp.asarray(eval_queries))
        r16 = recall_at_k(np.asarray(i16), gt_i)
        qps16 = timed_scan_qps(flat16_step, make_qstack, b, args.iters)
        results["flat_bf16"] = {"qps": round(qps16, 1), "recall": round(r16, 4)}
        print(f"flat bf16       qps={qps16:,.0f}  recall@{k}={r16:.3f}", flush=True)

    # ---- IVF-Flat -----------------------------------------------------------
    from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex, _ivf_search_program

    db_host = np.asarray(db)
    ivf = IVFFlatIndex(dim=d, nlist=args.nlist)
    t0 = time.perf_counter()
    ivf.train(db_host)
    ivf.add(db_host, np.arange(n, dtype=np.int64))
    centroids, c_sq, list_vecs, list_ids, pad = ivf._stage()
    jax.block_until_ready(list_vecs)
    build_s = time.perf_counter() - t0
    results["ivf_flat"] = {"build_s": round(build_s, 1), "nlist": args.nlist, "sweep": {}}
    print(f"ivf_flat build  {build_s:.1f}s (nlist={args.nlist}, pad={pad})", flush=True)

    nlist_eff = centroids.shape[0]
    for nprobe in args.nprobe_sweep:
        nprobe = min(nprobe, nlist_eff)
        program = _ivf_search_program(nlist_eff, pad, d, b, nprobe, k)

        def ivf_step(q, _p=program):
            return _p(centroids, c_sq, list_vecs, list_ids, q)

        _, ai = jax.jit(ivf_step)(jnp.asarray(eval_queries))
        rec = recall_at_k(np.asarray(ai), gt_i)
        qps = timed_scan_qps(ivf_step, make_qstack, b, args.iters)
        results["ivf_flat"]["sweep"][nprobe] = {"qps": round(qps, 1), "recall": round(rec, 4)}
        print(f"ivf_flat p={nprobe:<4d} qps={qps:,.0f}  recall@{k}={rec:.3f}", flush=True)

    # ---- IVF-PQ ---------------------------------------------------------------
    from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex, _adc_search_program

    if d % args.pq_m == 0:
        pq = IVFPQIndex(dim=d, nlist=args.nlist, m=args.pq_m)
        t0 = time.perf_counter()
        pq.train(db_host)
        pq.add(db_host, np.arange(n, dtype=np.int64))
        pcent, pc_sq, books, list_codes, plist_ids, ppad = pq._stage()
        jax.block_until_ready(list_codes)
        pq_build_s = time.perf_counter() - t0
        code_mb = n * args.pq_m / 1e6
        results["ivf_pq"] = {
            "build_s": round(pq_build_s, 1), "m": args.pq_m,
            "code_mb": round(code_mb, 1), "sweep": {},
        }
        print(
            f"ivf_pq build    {pq_build_s:.1f}s (m={args.pq_m}, codes {code_mb:.0f} MB "
            f"vs raw {n * d * 4 / 1e6:.0f} MB)",
            flush=True,
        )
        pn_eff = pcent.shape[0]
        for nprobe in args.nprobe_sweep:
            nprobe = min(nprobe, pn_eff)
            program = _adc_search_program(
                pn_eff, ppad, d, args.pq_m, books.shape[1], b, nprobe, k
            )

            def pq_step(q, _p=program):
                return _p(pcent, pc_sq, books, list_codes, plist_ids, q)

            _, ai = jax.jit(pq_step)(jnp.asarray(eval_queries))
            rec = recall_at_k(np.asarray(ai), gt_i)
            qps = timed_scan_qps(pq_step, make_qstack, b, args.iters)
            results["ivf_pq"]["sweep"][nprobe] = {"qps": round(qps, 1), "recall": round(rec, 4)}
            print(f"ivf_pq  p={nprobe:<4d} qps={qps:,.0f}  recall@{k}={rec:.3f}", flush=True)

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
