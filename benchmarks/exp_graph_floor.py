"""Measure the TPU floor of a graph-ANN (HNSW-class) search walk.

VERDICT r3 missing #2 / next #9: HNSW is sub-linear on corpora IVF
cannot cluster (iid Gaussian), so "match the reference's algorithm
class" needs either a TPU graph index or a measured case that the flat
SQ8 scan dominates any TPU-expressible graph walk at single-chip scale.

This measures the BEST CASE for a graph: a batched greedy walk over a
synthetic neighbor table — H dependent hops, each gathering G neighbor
rows per query, scoring them, and stepping to the argmin. Real HNSW
does strictly more work (visited-set bookkeeping, priority queues,
layer descent — all hostile to lax.scan); this kernel is just the
irreducible gather+score+argmin dependency chain, so its cost is a
LOWER bound for any faithful TPU port.

Two floors bind it:
  * the scattered row gather is per-row ISSUE-bound (~11-16 ns/row,
    exp_rerank_gather.py) and each hop's gather DEPENDS on the previous
    hop's argmin — no pipelining across hops;
  * each hop is a separate dependent device step (>= ~2.4 us grid-step
    overhead even when empty).

Usage: python benchmarks/exp_graph_floor.py   (TPU job — run alone)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp

N, D, B = 1_048_576, 768, 128
G = 32      # neighbors gathered per hop (HNSW M=32, the FAISS default)
HOPS = 150  # ~G*HOPS = 4800 scored candidates/query (efSearch-class work)


def main() -> int:
    print(f"# graph-walk floor {N} x {D}, G={G}, {HOPS} hops, B={B} "
          f"on {jax.default_backend()}", flush=True)
    db = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    neighbors = jax.random.randint(
        jax.random.key(1), (N, G), 0, N, dtype=jnp.int32
    )
    queries = jax.random.normal(jax.random.key(2), (B, D), jnp.float32)

    @jax.jit
    def walk(db, neighbors, queries, start):
        def hop(cur, _):
            cand = neighbors[cur]                          # (B, G) ids
            rows = db[cand.reshape(-1)].reshape(B, G, D)   # scattered gather
            d = jnp.sum(
                (rows - queries[:, None, :]) ** 2, axis=-1
            )                                              # (B, G)
            nxt = jnp.take_along_axis(
                cand, jnp.argmin(d, axis=1)[:, None], axis=1
            )[:, 0]
            return nxt, None

        final, _ = jax.lax.scan(hop, start, None, length=HOPS)
        return final

    start = jnp.zeros((B,), jnp.int32)

    # Chain two walk lengths by re-walking from the previous output —
    # the usual two-point trick, with the walk itself already serial.
    def chained(reps: int):
        @jax.jit
        def run(db, neighbors, queries, start):
            def rep(cur, _):
                return walk(db, neighbors, queries, cur), None

            out, _ = jax.lax.scan(rep, start, None, length=reps)
            # Return a dependent SCALAR: on this relay block_until_ready
            # can resolve before execution (CLAUDE.md hazard #2) — only
            # a host fetch of a value that depends on the whole chain
            # forces it.
            return jnp.sum(out)

        return run

    results = {}
    for reps_lo, reps_hi in [(2, 10)]:
        f_lo = chained(reps_lo)
        f_hi = chained(reps_hi)
        float(f_lo(db, neighbors, queries, start))
        float(f_hi(db, neighbors, queries, start))
        t0 = time.perf_counter()
        float(f_lo(db, neighbors, queries, start))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_hi(db, neighbors, queries, start))
        t_hi = time.perf_counter() - t0
        per_walk = (t_hi - t_lo) / (reps_hi - reps_lo)
        per_hop = per_walk / HOPS
        qps = B / per_walk
        print(
            f"walk ({HOPS} hops x {G} rows): {per_walk * 1e3:.2f} ms/batch "
            f"({per_hop * 1e6:.1f} us/hop) -> {qps:,.0f} QPS at B={B}",
            flush=True,
        )
        results = {
            "walk_ms_per_batch": round(per_walk * 1e3, 3),
            "us_per_hop": round(per_hop * 1e6, 2),
            "graph_walk_qps": round(qps, 1),
            "candidates_per_query": G * HOPS,
        }
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
