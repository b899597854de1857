"""10M-vector single-chip benchmark: IVF-PQ + bf16 refine at 10M x 384.

The BASELINE target's scale row. A 10M f32 corpus (15 GB at 384-d) does
not fit next to its index on one v5e, so this measures the compressed
deployment shape: PQ codes (m bytes/vector) for the scan + a bf16 refine
store (2 bytes/dim) for the exact re-rank — everything generated,
encoded, and kept ON DEVICE (host<->device is ~MB/s here), with the
ground truth computed by re-generating corpus chunks from their
deterministic keys and scanning at Precision.HIGHEST.

Usage:  python benchmarks/run10m.py            # 10M x 384 on TPU
        python benchmarks/run10m.py --quick    # small smoke config
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
    p.add_argument("--n", type=int, default=10_485_760)  # 10 x 1M, 2048-multiple
    p.add_argument("--d", type=int, default=384)
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--m", type=int, default=48)
    p.add_argument("--ksub", type=int, default=256,
                   help="PQ codebook size; 16 = 4-bit nibble-packed codes")
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=1_048_576)
    p.add_argument("--kmeans-iters", type=int, default=8)
    p.add_argument("--k-adc", type=str, default="512,1024",
                   help="comma list of refine shortlist depths")
    p.add_argument("--nprobes", type=str, default="4,8",
                   help="comma list of nprobe values")
    p.add_argument("--opq", action="store_true",
                   help="learn an OPQ rotation before encoding")
    p.add_argument("--opq-iters", type=int, default=6)
    p.add_argument("--corpus", choices=["clustered", "aniso", "zipf"],
                   default="clustered",
                   help="aniso = clustered corpus pushed through a fixed "
                        "decaying-spectrum anisotropic map (0.99^i "
                        "singular values mixed by a random rotation) — "
                        "the regime where OPQ is supposed to help; "
                        "zipf = HEAVY-TAILED cluster sizes (Zipf s=1.1 "
                        "over the generators: the largest cluster holds "
                        "~9%% of the corpus, the median one ~0.005%%) with "
                        "lognormal per-cluster spreads — the realistically "
                        "imbalanced regime where IVF cell imbalance and "
                        "spill policy actually bite (VERDICT r3 next #7)")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    if args.quick:
        args.n, args.d, args.b, args.m = 65_536, 128, 16, 16
        args.nlist, args.chunk, args.kmeans_iters = 256, 16_384, 3
        args.k_adc, args.nprobes = "64", "1,4"
    k_adcs = [int(s) for s in str(args.k_adc).split(",") if s]
    nprobes = [int(s) for s in args.nprobes.split(",") if s]

    n, d, b, k, m = args.n, args.d, args.b, args.k, args.m
    chunk = args.chunk
    n_chunks = n // chunk
    assert n % chunk == 0
    nlist = args.nlist
    n_gen_clusters = 4096

    from c99_vectordb_tpu.ops.kmeans import (
        assign_clusters,
        assign_clusters_multi,
        train_kmeans,
        train_kmeans_multi,
    )
    from c99_vectordb_tpu.ops.rerank import rerank_program_rows
    from c99_vectordb_tpu.ops.topk import merge_topk

    print(
        f"# corpus {n} x {d} (clustered, {n_chunks} x {chunk} chunks), "
        f"batch {b}, k {k}, m {m}, nlist {nlist} on {jax.default_backend()}",
        flush=True,
    )
    results: dict = {"config": vars(args)}

    aniso = args.corpus == "aniso"
    zipf = args.corpus == "zipf"

    def gen(key_idx, count):
        @jax.jit
        def _gen(marker):
            kc, kn = jax.random.split(jax.random.key(key_idx))
            centers = jax.random.normal(
                jax.random.key(1), (n_gen_clusters, d), dtype=jnp.float32
            )
            if zipf:
                # Heavy-tailed cluster SIZES via inverse-CDF sampling of
                # Zipf(s=1.1) weights, plus lognormal per-cluster
                # SPREADS — cells are realistically imbalanced in both
                # population and radius.
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
                x = centers[cid] * 3.0 + spread[cid][:, None] * (
                    jax.random.normal(kn, (marker.shape[0], d), jnp.float32)
                )
                return x
            cid = jax.random.randint(kc, (marker.shape[0],), 0, n_gen_clusters)
            x = centers[cid] * 3.0 + jax.random.normal(
                kn, (marker.shape[0], d), dtype=jnp.float32
            )
            if aniso:
                # Fixed linear map diag(0.99^i) @ Q: a decaying spectrum
                # whose principal axes are mixed across ALL coordinates,
                # so contiguous PQ subspaces carry unbalanced energy —
                # exactly the imbalance OPQ's learned rotation undoes.
                lam = jnp.power(jnp.float32(0.99), jnp.arange(d, dtype=jnp.float32))
                q_mix, _ = jnp.linalg.qr(
                    jax.random.normal(jax.random.key(5), (d, d), dtype=jnp.float32)
                )
                x = (x * lam[None, :]) @ q_mix
            return x

        return _gen(jnp.zeros((count,), jnp.int8))

    queries = gen(9999, b)
    q_sq = jnp.sum(queries * queries, axis=1)

    # ---- build: train on chunk 0, then encode every chunk ------------------
    t0 = time.perf_counter()
    first = gen(0, chunk)

    # OPQ: learn the rotation on a 64k host sample of chunk 0; everything
    # on the QUANTIZATION side (centroids, codebooks, codes, item consts,
    # query side of the ADC) lives in rotated space. The refine store and
    # the ground truth stay in the ORIGINAL space — rotation preserves L2,
    # so the exact rerank needs no rotation at all.
    rot_dev = None
    if args.opq:
        from c99_vectordb_tpu.models.ivf_pq import train_opq_rotation

        # Pass the device chunk straight in: train_opq_rotation strides
        # its own 64k sample on device (the old np.asarray pull moved
        # ~100 MB device->host only to push it back).
        rot = train_opq_rotation(first, m, iters=args.opq_iters, seed=3)
        rot_dev = jnp.asarray(rot)
        print(f"opq rotation trained ({time.perf_counter() - t0:.1f}s)", flush=True)

    def rotate(x):
        # NOT jitted standalone: a jit closure over rot_dev would bake it
        # in as a compile-time constant (CLAUDE.md hazard #4).
        if rot_dev is None:
            return x
        return jnp.dot(x, rot_dev, preferred_element_type=jnp.float32)

    first_r = rotate(first)
    centroids = train_kmeans(first_r, nlist, iters=args.kmeans_iters, out_device=True)
    assign0 = assign_clusters(first_r, centroids, out_device=True)
    dsub = d // m

    @jax.jit
    def residual_subs(x, cents, a):
        return (x - cents[a]).reshape(x.shape[0], m, dsub).transpose(1, 0, 2)

    ksub = args.ksub
    books = train_kmeans_multi(
        residual_subs(first_r, centroids, assign0), ksub,
        iters=args.kmeans_iters, out_device=True,
    )
    del first, first_r, assign0

    # Per-chunk: regenerate, assign, encode. The big device stores update
    # IN PLACE via donated dynamic_update_slice — a concatenate would
    # double-buffer the 7.7 GB bf16 refine store and OOM the chip.
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def write_refine(store, x, start):
        return jax.lax.dynamic_update_slice(
            store, x.astype(jnp.bfloat16), (start, 0)
        )

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def write_codes(store, c, start):
        return jax.lax.dynamic_update_slice(
            store, c.astype(jnp.uint8).T, (start, 0)
        )

    refine_dev = jnp.zeros((n, d), jnp.bfloat16)
    codes_dev = jnp.zeros((n, m), jnp.uint8)
    assigns = []
    for ci in range(n_chunks):
        x = gen(ci, chunk)
        xr = rotate(x)                                      # encode space
        a = assign_clusters(xr, centroids, out_device=True)
        c = assign_clusters_multi(residual_subs(xr, centroids, a), books,
                                  out_device=True)
        assigns.append(a)                                   # stays on device
        refine_dev = write_refine(refine_dev, x, jnp.int32(ci * chunk))
        codes_dev = write_codes(codes_dev, c, jnp.int32(ci * chunk))
        del x, xr, a, c
    assign_dev = jnp.concatenate(assigns)
    float(jnp.sum(refine_dev[0].astype(jnp.float32)))

    # Bucket codes into padded lists — ON DEVICE. The old host round
    # trip (pull assign, push order/sorted_lists/slots) moved 4 n-sized
    # arrays (~160 MB at 10M) through this container's 1-30 MB/s link;
    # now only the (nlist,) counts come back, for the pad size.
    @jax.jit
    def bucketize(a):
        order = jnp.argsort(a, stable=True).astype(jnp.int32)
        sorted_lists = a[order]
        starts = jnp.searchsorted(
            sorted_lists, jnp.arange(nlist, dtype=sorted_lists.dtype)
        ).astype(jnp.int32)
        counts = jnp.diff(jnp.append(starts, jnp.int32(n)))
        slots = jnp.arange(n, dtype=jnp.int32) - starts[sorted_lists]
        return order, sorted_lists, slots, counts

    order, sorted_lists, slots, counts_d = bucketize(assign_dev)
    counts = np.asarray(counts_d)
    pad = int(-(-max(int(counts.max(initial=1)), 8) // 128) * 128)
    ids_dev = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def scatter(codes, ids, order, lists, slots):
        lc = (
            jnp.zeros((nlist, pad, m), jnp.uint8).at[lists, slots].set(codes[order])
        )
        li = jnp.full((nlist, pad), -1, jnp.int32).at[lists, slots].set(ids[order])
        return lc, li

    list_codes, list_ids = scatter(codes_dev, ids_dev, order, sorted_lists, slots)

    from c99_vectordb_tpu.ops.adc_pallas import (
        CODE_LANES,
        adc_dense_search_program,
        build_item_constants_device,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Pad (and for 4-bit codebooks nibble-pack) in ONE jitted program:
        # materializing the unpacked (nlist, 128, pad) canvas next to the
        # packed one OOMs the chip beside the 8 GB refine store.
        def stage_codes(c):
            if ksub == 16 and m % 2 == 0:
                # Pack on the small (nlist, pad, m) layout BEFORE the big
                # row-padded canvas exists: m/2 bytes/vector on device.
                c = c[:, :, 0::2] | (c[:, :, 1::2] << 4)
            rows = c.shape[2]
            canvas_rows = CODE_LANES // 2 if rows < m else CODE_LANES
            return jnp.pad(
                c.transpose(0, 2, 1), ((0, 0), (0, canvas_rows - rows), (0, 0))
            )

        # Item constants FIRST (needs only the row-major codes_dev), so
        # codes_dev is freed before the (nlist, 128, pad) canvas exists —
        # overlapping them OOMed one v5e at 10M next to the refine store.
        item_const_d = build_item_constants_device(
            centroids, assign_dev, codes_dev, books,
            order, sorted_lists, slots, nlist, pad,
        )
        float(jnp.sum(item_const_d[0]))
        del codes_dev
        codes128 = jax.jit(stage_codes)(list_codes)
        float(jnp.sum(codes128[0].astype(jnp.float32)))
        del list_codes  # only the CPU fallback scans the unpacked lists
    else:
        del codes_dev
    build_s = time.perf_counter() - t0
    code_mb = n * m / 1e6 * (0.5 if ksub == 16 and m % 2 == 0 else 1.0)
    refine_mb = n * d * 2 / 1e6
    print(
        f"build {build_s:.1f}s  codes {code_mb:.0f} MB + bf16 refine "
        f"{refine_mb:.0f} MB vs raw f32 {n * d * 4 / 1e6:.0f} MB (pad={pad})",
        flush=True,
    )
    results["build_s"] = round(build_s, 1)
    results["code_mb"] = round(code_mb, 1)
    results["refine_mb"] = round(refine_mb, 1)

    # ---- ground truth: chunked HIGHEST-precision scan ----------------------
    @jax.jit
    def gt_chunk(carry, x, x0):
        best_d, best_i = carry
        sq = jnp.sum(x * x, axis=1)
        ip = jax.lax.dot_general(
            queries, x.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dist = sq[None, :] - 2.0 * ip + q_sq[:, None]
        ids = x0 + jnp.arange(x.shape[0], dtype=jnp.int32)
        alld = jnp.concatenate([best_d, dist], axis=1)
        alli = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids[None, :], dist.shape)], axis=1
        )
        neg, pos = jax.lax.top_k(-alld, k)
        return -neg, jnp.take_along_axis(alli, pos, axis=1)

    gt = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    for ci in range(n_chunks):
        gt = gt_chunk(gt, gen(ci, chunk), jnp.int32(ci * chunk))
    gt_i = np.asarray(gt[1])

    def recall(ai):
        return sum(
            len(set(ai[q].tolist()) & set(gt_i[q].tolist())) for q in range(b)
        ) / gt_i.size

    # ---- search: dense ADC + bf16 exact refine ------------------------------
    c_sq = jnp.sum(centroids * centroids, axis=1)

    def timed_qps(step, ops, iters=6):
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
            if t_hi > 1.5 * t_lo or hi >= 256:
                break
            hi *= 4
        return b * (hi - lo) / max(t_hi - t_lo, 1e-9)

    def shortlist_recall(ci_np):
        return sum(
            len(set(ci_np[q].tolist()) & set(gt_i[q].tolist())) for q in range(b)
        ) / gt_i.size

    for nprobe in nprobes:
        for k_adc in k_adcs:
            if on_tpu:
                adc = adc_dense_search_program(
                    nlist, pad, d, m, ksub, b, nprobe, k_adc
                )
                rr = rerank_program_rows(n, d, b, k_adc, k, "bfloat16")
                adc_ops = (
                    centroids, c_sq, books, codes128, item_const_d, list_ids,
                )
            else:
                from c99_vectordb_tpu.models.ivf_pq import _adc_search_program

                adc = _adc_search_program(nlist, pad, d, m, ksub, b, nprobe, k_adc)
                rr = rerank_program_rows(n, d, b, k_adc, k, "bfloat16")
                adc_ops = (centroids, c_sq, books, list_codes, list_ids)

            if rot_dev is None:

                # ids ARE refine-store rows (iota): rows-mode rerank,
                # no id->row table gather (~1.7 ms/batch at k_adc=1024)
                def refined_step(q, ref, *ao):
                    cd, ci = adc(*ao, q)
                    return rr(ref, ci, ci, q)

                ops = (refine_dev,) + adc_ops
            else:
                # ADC runs in the rotated (quantization) space; the exact
                # bf16 rerank stays in the original space (L2-preserving).
                def refined_step(q, ref, rotm, *ao):
                    qr = jnp.dot(q, rotm, preferred_element_type=jnp.float32)
                    cd, ci = adc(*ao, qr)
                    return rr(ref, ci, ci, q)

                ops = (refine_dev, rot_dev) + adc_ops

            _, ai = jax.jit(refined_step)(queries, *ops)
            rec = recall(np.asarray(ai))
            # Diagnostic: is recall shortlist-bound (GT missing from the
            # ADC candidates) or refine-bound (bf16 rerank reordering)?
            q_enc = rotate(queries)
            _, ci_all = jax.jit(lambda q, *ao: adc(*ao, q))(q_enc, *adc_ops)
            srec = shortlist_recall(np.asarray(ci_all))
            qps = timed_qps(refined_step, ops)
            results[f"refined_p{nprobe}_k{k_adc}"] = {
                "qps": round(qps, 1), "recall": round(rec, 4),
                "shortlist_recall": round(srec, 4), "k_adc": k_adc,
                "opq": bool(args.opq),
            }
            print(
                f"ivf_pq+bf16refine p={nprobe} (top{k_adc}"
                f"{', opq' if args.opq else ''}) "
                f"qps={qps:,.0f}  recall@{k}={rec:.3f}  shortlist={srec:.3f}",
                flush=True,
            )

    line = json.dumps(results)
    print(line, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
