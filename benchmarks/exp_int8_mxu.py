"""Does Mosaic lower int8 x int8 -> int32 dot_general to the v5e's
double-rate int8 MXU path, and what rate does it sustain at the fused
flat kernel's tile shapes?

Times a bare matmul kernel (no epilogue, no selection) over a 1M x 768
corpus at the production tile shape (tile_b x 768) x (768 x 1024) in
three operand configs: f32, bf16, int8. The published peaks are ~181
TFLOP/s bf16-multiply and ~2x that for int8; if the int8 kernel runs
near 2x, rewriting the SQ8 scan epilogue for an int8 query operand is
worth it (bench headline is currently MXU-bound at large B).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np

from c99_vectordb_tpu.utils.runtime import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, TB, TN = 1_048_576, 768, 256, 1024


def make_prog(dtype, acc_dtype, b):
    def kernel(q_ref, db_ref, out_ref, acc):
        n_idx = pl.program_id(0)
        b_idx = pl.program_id(1)
        row0 = pl.multiple_of(b_idx * TB, 8)

        @pl.when(n_idx == 0)
        def _init():
            acc[pl.ds(row0, TB), :] = jnp.zeros((TB, 1), jnp.float32)

        q = q_ref[pl.ds(row0, TB), :]
        x = db_ref[:]
        ip = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        # One reducing add per tile so the matmul is not dead code; the
        # (TB, 1)-shaped accumulate is negligible next to the matmul.
        acc[pl.ds(row0, TB), :] += jnp.sum(ip, axis=1, keepdims=True).astype(
            jnp.float32
        )

        @pl.when(n_idx == pl.num_programs(0) - 1)
        def _out():
            out_ref[:] = acc[:]

    grid = (N // TN, b // TB)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, D), lambda i, j: (0, 0)),
                pl.BlockSpec((TN, D), lambda i, j: (i, 0)),
            ],
            out_specs=pl.BlockSpec((b, 1), lambda i, j: (0, 0)),
            scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )

    @jax.jit
    def run(q, db):
        return call(q, db)

    return run


def timed_ms(run, q, db, b):
    @jax.jit
    def chain(qstack, db):
        def body(s, qi):
            out = run(qi + (s * 0.0).astype(qi.dtype), db)
            return s + out[0, 0] * 0.0 + 1.0, None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), qstack)
        return s

    def t(steps):
        qstack = jnp.stack([q] * steps)
        float(chain(qstack, db))
        t0 = time.perf_counter()
        float(chain(qstack, db))
        return time.perf_counter() - t0

    lo, hi = 2, 10
    tl, th = t(lo), t(hi)
    return (th - tl) / (hi - lo) * 1e3


def main():
    key = jax.random.key(0)
    db_f32 = jax.random.normal(key, (N, D), jnp.float32)
    q_f32 = jax.random.normal(jax.random.key(1), (1024, D), jnp.float32)
    float(jnp.sum(db_f32[0]))

    for b in (256, 1024):
        flops = 2 * b * N * D
        for name, dtype, acc in (
            ("f32", jnp.float32, jnp.float32),
            ("bf16", jnp.bfloat16, jnp.float32),
            ("int8", jnp.int8, jnp.int32),
        ):
            if dtype == jnp.int8:
                db = jnp.clip(jnp.rint(db_f32 * 30), -127, 127).astype(jnp.int8)
                q = jnp.clip(jnp.rint(q_f32[:b] * 30), -127, 127).astype(jnp.int8)
            else:
                db = db_f32.astype(dtype)
                q = q_f32[:b].astype(dtype)
            jax.block_until_ready((db, q))
            try:
                run = make_prog(dtype, acc, b)
                ms = timed_ms(run, q, db, b)
                print(
                    f"B={b} {name:5s}: {ms:8.2f} ms/scan  "
                    f"{flops / ms / 1e9:7.1f} TFLOP/s",
                    flush=True,
                )
            except Exception as e:  # lowering failure is a result too
                print(f"B={b} {name:5s}: FAILED {type(e).__name__}: {e}",
                      flush=True)
            del db, q


if __name__ == "__main__":
    raise SystemExit(main())
