"""Shortlist selection cost: lax.top_k vs approx_min_k at dense-ADC widths.

At 10M the refined-PQ composite is no longer ADC-kernel-bound (hi/lo
took the kernel to ~10us of a ~56us/query step): the XLA top_k that
shortlists the dense (B, nprobe*pad) output at k_adc=512..2048 is a
full bitonic sort network. Shortlists feed an EXACT rerank, so exact
selection is unnecessary — TPU's approx_min_k (PartialReduce op)
trades a bounded recall loss for a much cheaper reduction.

Measures top_k vs approx_min_k at the 10M dense-ADC shape and reports
the overlap of the selected sets (the only thing the rerank sees).

Usage: python benchmarks/exp_approx_topk.py   (TPU)
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

B = 128


def timed(fn, d, iters=64):
    @jax.jit
    def chain(mk, d):
        def body(s, _):
            v, i = fn(d + s * 0.0)
            return s + v[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=mk.shape[0])
        return s

    def run(steps):
        mk = jnp.zeros((steps,))
        float(chain(mk, d))
        t0 = time.perf_counter()
        float(chain(mk, d))
        return time.perf_counter() - t0

    lo, hi = 2, 2 + iters
    t_lo = run(lo)
    while True:
        t_hi = run(hi)
        if t_hi > 1.5 * t_lo or hi >= 1024:
            break
        hi *= 4
    return (t_hi - t_lo) / (hi - lo)


def main():
    for width, ks in [(11264, (512, 1024, 2048)), (2048, (200,)),
                      (384, (20,))]:
        d = jax.random.normal(jax.random.key(0), (B, width), jnp.float32)
        for k in ks:
            def exact(x, k=k):
                neg, idx = jax.lax.top_k(-x, k)
                return -neg, idx

            def approx(x, k=k):
                return jax.lax.approx_min_k(x, k, recall_target=0.95)

            def approx99(x, k=k):
                return jax.lax.approx_min_k(x, k, recall_target=0.99)

            te = timed(exact, d)
            ta = timed(approx, d)
            ta99 = timed(approx99, d)
            # set overlap vs exact (what the rerank sees)
            _, ie = jax.jit(exact)(d)
            _, ia = jax.jit(approx)(d)
            _, ia99 = jax.jit(approx99)(d)
            ie, ia, ia99 = map(np.asarray, (ie, ia, ia99))
            ov = np.mean([
                len(set(ie[q]) & set(ia[q])) / k for q in range(B)
            ])
            ov99 = np.mean([
                len(set(ie[q]) & set(ia99[q])) / k for q in range(B)
            ])
            print(
                f"w={width} k={k}: top_k {te * 1e6:,.0f}us/batch | "
                f"approx95 {ta * 1e6:,.0f}us ({te / ta:.1f}x, ov {ov:.3f})"
                f" | approx99 {ta99 * 1e6:,.0f}us ({te / ta99:.1f}x, "
                f"ov {ov99:.3f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
