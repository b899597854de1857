"""int8 SQ8 flat scan: compile check + strict recall + QPS at 1M x 768.

Measures the symmetric per-dimension scalar-quantized scan (FlatIndex
scan_dtype="int8") against a Precision.HIGHEST ground truth, at B=128 and
B=1024, alongside the bf16 and f32 composites for same-run comparability
(run-to-run variance on this relay is ~±20%; same-process rows share the
machine state).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

from c99_vectordb_tpu.ops.rerank import rerank_program, shortlist_depth
from c99_vectordb_tpu.ops.topk_pallas import fused_topk

N, D, K = 1_048_576, 768, 10
NCLUST = 4096


@jax.jit
def gen(marker, key_idx):
    kc, kn = jax.random.split(jax.random.key(key_idx))
    centers = jax.random.normal(jax.random.key(1), (NCLUST, D), jnp.float32)
    cid = jax.random.randint(kc, (marker.shape[0],), 0, NCLUST)
    return centers[cid] * 3.0 + jax.random.normal(
        kn, (marker.shape[0], D), jnp.float32
    )


def timed_qps(step, ops, b, iters=4):
    @jax.jit
    def chain(qstack, *ops):
        def body(s, q):
            out_d, _ = step(q + s * 0.0, *ops)
            return s + out_d[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def run(steps):
        qstack = gen(jnp.zeros((steps * b,)), 7).reshape(steps, b, D)
        float(chain(qstack, *ops))
        t0 = time.perf_counter()
        float(chain(qstack, *ops))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if t_hi > 1.5 * t_lo or hi >= 128:
            break
        hi *= 4
    return b * (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    db = gen(jnp.zeros((N,)), 0)
    sq = jnp.sum(db * db, axis=1)
    ids = jnp.arange(N, dtype=jnp.int32)
    db16 = db.astype(jnp.bfloat16)

    @jax.jit
    def sq8_stage(_db):
        scale = jnp.max(jnp.abs(_db), axis=0) / 127.0
        codes = jnp.clip(jnp.round(_db / scale), -127, 127).astype(jnp.int8)
        dec_sq = jnp.sum((codes.astype(jnp.float32) * scale) ** 2, axis=1)
        return scale, codes, dec_sq

    scale, codes, dec_sq = sq8_stage(db)
    float(jnp.sum(dec_sq))

    # HIGHEST-precision GT for one eval batch
    b_eval = 128
    eval_q = gen(jnp.zeros((b_eval,)), 9)

    @jax.jit
    def gt_scan(_db, _sq, q):
        q_sq = jnp.sum(q * q, axis=1)
        chunks = _db.reshape(N // 2048, 2048, D)
        sq_chunks = _sq.reshape(N // 2048, 2048)

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
                [best_i, jnp.broadcast_to(bids, (b_eval, 2048))], axis=1
            )
            neg, pos = jax.lax.top_k(-alld, K)
            return (-neg, jnp.take_along_axis(alli, pos, axis=1)), None

        init = (jnp.full((b_eval, K), jnp.inf, jnp.float32),
                jnp.full((b_eval, K), -1, jnp.int32))
        (bd, bi), _ = jax.lax.scan(
            step, init,
            (chunks, sq_chunks, jnp.arange(N // 2048, dtype=jnp.int32)),
        )
        return bd, bi

    _, gt_i = gt_scan(db, sq, eval_q)
    gt_i = np.asarray(gt_i)
    ks = shortlist_depth(K, N)

    def comp_f32(b):
        def fn(q, _db, _ids, _sq):
            _, ci = fused_topk(_db, _ids, _sq, q, ks)
            return rerank_program(N, D, N, b, ks, K, "float32")(_db, _ids, ci, q)
        return fn

    def comp_bf16(b):
        def fn(q, _db16, _db, _ids, _sq):
            _, ci = fused_topk(_db16, _ids, _sq, q, ks)
            return rerank_program(N, D, N, b, ks, K, "float32")(_db, _ids, ci, q)
        return fn

    def comp_sq8(b, q_int8=False):
        def fn(q, _codes, _scale, _db, _ids, _dsq):
            _, ci = fused_topk(_codes, _ids, _dsq, q * _scale, ks,
                               q_int8=q_int8)
            return rerank_program(N, D, N, b, ks, K, "float32")(_db, _ids, ci, q)
        return fn

    def comp_sq8_rows(b, q_int8=True):
        # rows-mode A/B: same scan, rerank by the kernel's winner rows
        # (no id->row table gather — ops/rerank.rerank_program_rows)
        from c99_vectordb_tpu.ops.rerank import rerank_program_rows

        def fn(q, _codes, _scale, _db, _ids, _dsq):
            _, ci, rows = fused_topk(_codes, _ids, _dsq, q * _scale, ks,
                                     q_int8=q_int8, return_rows=True)
            return rerank_program_rows(N, D, b, ks, K, "float32")(
                _db, rows, ci, q)
        return fn

    import functools

    cases = [
        ("sq8i8+ROWS", comp_sq8_rows, (codes, scale, db, ids, dec_sq)),
        ("sq8i8+rr32", functools.partial(comp_sq8, q_int8=True),
         (codes, scale, db, ids, dec_sq)),
        ("sq8+rr32", comp_sq8, (codes, scale, db, ids, dec_sq)),
        ("bf16+rr32", comp_bf16, (db16, db, ids, sq)),
        ("f32+rr32", comp_f32, (db, ids, sq)),
    ]
    for name, mk, ops in cases:
        _, ai = jax.jit(mk(b_eval))(eval_q, *ops)
        rec = sum(
            len(set(np.asarray(ai)[q].tolist()) & set(gt_i[q].tolist()))
            for q in range(b_eval)
        ) / gt_i.size
        for b in (128, 1024):
            for rep in range(2):
                qps = timed_qps(mk(b), ops, b)
                print(f"{name:<10} B={b:<5} rep{rep} {qps:>10,.0f} QPS  "
                      f"recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
