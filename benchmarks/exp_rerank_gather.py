"""Rerank gather-order experiment: does index ORDER move the row-gather?

The exact-rerank stage is the floor of every composite (CLAUDE.md):
XLA's scattered row gather of the shortlist runs ~30 ns/row (~100-130
GB/s effective) regardless of depth. Two prior attacks (Pallas
scalar-prefetch rerank, deeper pipelining) are measured dead ends.
This experiment asks the remaining cheap question: is the gather bound
by RANDOMNESS (HBM page locality / prefetch) or by per-row issue cost?

Measured here, 1M x 768 f32 store on device:
  A. gather of R random rows            (the production pattern)
  B. gather of the SAME rows sorted     (ascending addresses)
  C. gather of R contiguous rows        (best case: one linear read)
  D. full rerank program as shipped vs a variant that sorts the
     (row, id) pairs per query before gathering (axis=1 argsort on the
     shortlist — cheap, r<=256) and lets merge_topk restore order.

If B ~= A the gather is issue-bound and sorting is a dead end; if
B -> C the fix is one argsort away.
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

from c99_vectordb_tpu.ops.topk import merge_topk

N, D = 1_048_576, 768
B, K = 128, 10


def timed_us(step, ops, vary_shape, lo=64, hi=576):
    """us per step; `vary_shape` = per-step varying int32 operand shape.

    Fixed two chain lengths (compile count matters more than adaptivity
    on this relay: each length is a separate ~25 s compile)."""

    @jax.jit
    def chain(vstack, *ops):
        def body(s, v):
            # float s*0.0 is NOT foldable (NaN semantics) — an int *0
            # dependence gets strength-reduced and the step hoisted.
            out = step(v + s * 0.0, *ops)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return s + leaf.reshape(-1)[0].astype(jnp.float32) * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), vstack)
        return s

    def run(steps):
        # All-zero varying operand, created ON DEVICE (a host-side array
        # would cross the 1-30 MB/s transfer link).
        vstack = jnp.zeros((steps,) + vary_shape, jnp.float32)
        float(chain(vstack, *ops))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(vstack, *ops))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo) * 1e6


def main():
    which = set(sys.argv[1:]) or {"abc", "rerank"}
    rng = np.random.default_rng(0)
    # Corpus generated ON DEVICE (host->device runs at 1-30 MB/s here);
    # only the small index arrays cross the link.
    vectors = jax.random.normal(jax.random.key(0), (N, D), dtype=jnp.float32)
    queries = jax.random.normal(jax.random.key(1), (B, D), dtype=jnp.float32)
    jax.block_until_ready(vectors)
    row_bytes = D * 4

    for r in (20, 200):
        total = B * r
        base = rng.integers(0, N, size=(total,), dtype=np.int32)
        cases = {
            "A random": jnp.asarray(base),
            "B sorted": jnp.asarray(np.sort(base)),
            "C contig": jnp.asarray(
                (np.arange(total, dtype=np.int32) + 12345) % N
            ),
        }

        def gather_step(delta, rows, vectors):
            rows = rows + (delta[: rows.shape[0]] * 0.0).astype(jnp.int32)
            v = vectors[rows]
            return jnp.sum(v, axis=1)  # consume every gathered byte

        if "abc" in which:
            for name, rows in cases.items():
                us = timed_us(gather_step, (rows, vectors), (total,))
                gbs = total * row_bytes / (us * 1e-6) / 1e9
                print(
                    f"r={r:4d} {name}: {us:8.1f} us/batch  "
                    f"{us / total * 1e3:6.1f} ns/row  {gbs:6.1f} GB/s",
                    flush=True,
                )

        # D. full rerank: shipped vs per-query-sorted variant
        cand_rows = rng.integers(0, N, size=(B, r), dtype=np.int32)
        cand_ids = jnp.asarray(cand_rows)  # ids == rows (dense identity)

        def rerank_plain(delta, cand_ids, vectors, queries):
            cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
            rows = jnp.maximum(cand_ids, 0)
            vecs = vectors[rows].astype(jnp.float32)
            diff = vecs - queries[:, None, :]
            exact = jnp.sum(diff * diff, axis=-1)
            exact = jnp.where(cand_ids >= 0, exact, jnp.inf)
            return merge_topk(exact, cand_ids, K)

        def rerank_sorted(delta, cand_ids, vectors, queries):
            cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
            order = jnp.argsort(cand_ids, axis=1)
            cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
            rows = jnp.maximum(cand_ids, 0)
            vecs = vectors[rows].astype(jnp.float32)
            diff = vecs - queries[:, None, :]
            exact = jnp.sum(diff * diff, axis=-1)
            exact = jnp.where(cand_ids >= 0, exact, jnp.inf)
            return merge_topk(exact, cand_ids, K)

        def rerank_gsorted(delta, cand_ids, vectors, queries):
            cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
            flat = cand_ids.reshape(-1)
            order = jnp.argsort(flat)
            inv = jnp.argsort(order)
            srows = jnp.maximum(flat[order], 0)
            qidx = (order // r).astype(jnp.int32)
            vecs = vectors[srows].astype(jnp.float32)
            q = queries[qidx]
            diff = vecs - q
            d = jnp.sum(diff * diff, axis=-1)
            exact = d[inv].reshape(B, r)
            exact = jnp.where(cand_ids >= 0, exact, jnp.inf)
            return merge_topk(exact, cand_ids, K)

        if "rerank" in which:
            variants = (
                ("D plain  rerank", rerank_plain),
                ("E qsort  rerank", rerank_sorted),
                ("F gsort  rerank", rerank_gsorted),
            )
            if "prod" in which:  # comparison run: only D is needed
                variants = variants[:1]
            for name, fn in variants:
                us = timed_us(fn, (cand_ids, vectors, queries), (B * r,))
                print(f"r={r:4d} {name}: {us:8.1f} us/batch", flush=True)

        if "prod" in which:
            # G: the PRODUCTION program (ops/rerank.exact_rerank) at the
            # sq8-IVF composite's exact shapes — bucketed (nlist*pad, D)
            # store + pow2 id->row table — vs D above. Stage attribution
            # charged the composite's rerank ~61 us/batch at r=20 where D
            # measures ~32; this isolates whether the production program
            # itself is 2x the equivalent inline code or the attribution
            # included pipeline effects.
            from c99_vectordb_tpu.models.base import next_pow2
            from c99_vectordb_tpu.ops.rerank import rerank_program

            n_store = 4096 * 384  # nlist * pad at the 1M config
            store = jnp.pad(vectors, ((0, n_store - N), (0, 0)))
            cap = next_pow2(N)
            row_of_id = jnp.asarray(
                np.concatenate([
                    rng.permutation(n_store)[:N].astype(np.int32),
                    np.zeros((cap - N,), np.int32),
                ])
            )
            prog = rerank_program(n_store, D, cap, B, r, K, "float32")

            def rerank_production(delta, cand_ids, store, row_of_id, queries):
                cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
                return prog(store, row_of_id, cand_ids, queries)

            us = timed_us(
                rerank_production, (cand_ids, store, row_of_id, queries),
                (B * r,),
            )
            print(f"r={r:4d} G prod   rerank: {us:8.1f} us/batch", flush=True)

            # H: same program with the id->row translation cut from the
            # row gather by an optimization barrier. Hypothesis: XLA
            # fuses gather(gather) into one combined access pattern that
            # loses the efficient per-row DMA, costing 2x (G vs D).
            def rerank_barrier(delta, cand_ids, store, row_of_id, queries):
                cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
                safe = jnp.clip(jnp.maximum(cand_ids, 0), 0, cap - 1)
                rows = jax.lax.optimization_barrier(row_of_id[safe])
                vecs = store[rows].astype(jnp.float32)
                diff = vecs - queries[:, None, :]
                exact = jnp.sum(diff * diff, axis=-1)
                exact = jnp.where(cand_ids >= 0, exact, jnp.inf)
                return merge_topk(exact, cand_ids, K)

            us = timed_us(
                rerank_barrier, (cand_ids, store, row_of_id, queries),
                (B * r,),
            )
            print(f"r={r:4d} H barrier rerank: {us:8.1f} us/batch", flush=True)

            # I: G's exact structure but gathering straight from the ids
            # (no table) — isolates whether the second gather or the
            # padded/larger store is the cost.
            def rerank_notable(delta, cand_ids, store, row_of_id, queries):
                cand_ids = cand_ids + (delta.reshape(B, r) * 0.0).astype(jnp.int32)
                rows = jnp.clip(jnp.maximum(cand_ids, 0), 0, n_store - 1)
                vecs = store[rows].astype(jnp.float32)
                diff = vecs - queries[:, None, :]
                exact = jnp.sum(diff * diff, axis=-1)
                exact = jnp.where(cand_ids >= 0, exact, jnp.inf)
                return merge_topk(exact, cand_ids, K)

            us = timed_us(
                rerank_notable, (cand_ids, store, row_of_id, queries),
                (B * r,),
            )
            print(f"r={r:4d} I notable rerank: {us:8.1f} us/batch", flush=True)


if __name__ == "__main__":
    main()
