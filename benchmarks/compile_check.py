"""Real-TPU Mosaic compile gate: build + run EVERY Pallas kernel variant.

Interpret-mode tests cannot catch Mosaic lowering failures (CLAUDE.md),
so every kernel-touching change must pass this gate on the chip before
it is trusted. One serial process (never run two TPU jobs at once),
small-but-realistic shapes, all operands generated ON DEVICE (the
host->device link is ~MB/s). Exits non-zero on any failure.

Covers (VERDICT round 2, next #5):
  flat fused_topk        f32 / bf16 / int8  x  B in {128, 1024}
  ivf scan               select / dense / multi(q4) / bf16 dense+select
  ivf SQ8                qps_step 1 and 8 (int8 x int8 MXU path)
  adc                    select / dense
  sharded (1-chip mesh)  f32 kernels-in-shard_map / SQ8-in-shard_map

Usage:  python benchmarks/compile_check.py          (~5 min warm cache)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from c99_vectordb_tpu.utils.runtime import configure_jax_cache

    configure_jax_cache()
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(
            "compile_check: backend is "
            f"{jax.default_backend()!r}, not tpu — the Mosaic gate only "
            "means anything on the chip. Refusing to fake a pass."
        )
        return 2

    from c99_vectordb_tpu.models.ivf_flat import _sq8_stage
    from c99_vectordb_tpu.ops.adc_pallas import (
        CODE_LANES,
        adc_dense_search_program,
        adc_full_search_program,
        pack_nibbles,
    )
    from c99_vectordb_tpu.ops.ivf_scan_pallas import (
        ivf_full_search_program,
        ivf_sq8_search_program,
    )
    from c99_vectordb_tpu.ops.topk_pallas import fused_topk

    dim, k = 768, 10
    key = jax.random.PRNGKey(0)

    # ---- flat store (4096 rows: a tile multiple for tile_n 1024 + 2048)
    n_flat = 4096
    db = jax.random.normal(key, (n_flat, dim), jnp.float32)
    flat_ids = jnp.arange(n_flat, dtype=jnp.int32)
    sq = jnp.sum(db * db, axis=1)
    db_bf16 = db.astype(jnp.bfloat16)
    maxabs = jnp.maximum(jnp.max(jnp.abs(db), axis=0), 1e-30)
    scale = maxabs / 127.0
    db_i8 = jnp.clip(jnp.rint(db / scale), -127, 127).astype(jnp.int8)
    dec = db_i8.astype(jnp.float32) * scale
    sq_i8 = jnp.sum(dec * dec, axis=1)
    q128 = jax.random.normal(jax.random.PRNGKey(1), (128, dim), jnp.float32)
    q1024 = jax.random.normal(jax.random.PRNGKey(2), (1024, dim), jnp.float32)

    # ---- inverted lists (64 lists x 384 pad)
    nlist, pad, nprobe = 64, 384, 4
    lv = jax.random.normal(jax.random.PRNGKey(3), (nlist, pad, dim), jnp.float32)
    li = np.arange(nlist * pad, dtype=np.int32).reshape(nlist, pad)
    li[:, -8:] = -1  # some padding slots
    li = jnp.asarray(li)
    lsqn = jnp.sum(lv * lv, axis=-1)
    centroids = jnp.mean(lv, axis=1)
    c_sq = jnp.sum(centroids * centroids, axis=1)
    codes_l, dscale, dec_sqn = _sq8_stage(lv, li)
    lv_bf16 = lv.astype(jnp.bfloat16)

    # ---- ADC operands (m=96, ksub=256)
    m, ksub = 96, 256
    dsub = dim // m
    books = jax.random.normal(jax.random.PRNGKey(4), (m, ksub, dsub), jnp.float32)
    codes128 = jnp.concatenate(
        [
            jax.random.randint(
                jax.random.PRNGKey(5), (nlist, m, pad), 0, ksub, jnp.int32
            ).astype(jnp.uint8),
            jnp.zeros((nlist, CODE_LANES - m, pad), jnp.uint8),
        ],
        axis=1,
    )
    item_const = jax.random.normal(jax.random.PRNGKey(6), (nlist, pad), jnp.float32)

    checks = [
        (
            "flat_f32_b128",
            lambda: fused_topk(db, flat_ids, sq, q128, k),
        ),
        (
            "flat_bf16_b128",
            lambda: fused_topk(db_bf16, flat_ids, sq, q128, k),
        ),
        (
            "flat_int8_b128",
            lambda: fused_topk(db_i8, flat_ids, sq_i8, q128 * scale, k),
        ),
        (
            "flat_f32_b1024",
            lambda: fused_topk(db, flat_ids, sq, q1024, k),
        ),
        (
            "flat_int8_b1024",
            lambda: fused_topk(db_i8, flat_ids, sq_i8, q1024 * scale, k),
        ),
        (
            "ivf_select_f32",
            lambda: ivf_full_search_program(
                nlist, pad, dim, 128, nprobe, k, exact=True, dense=False
            )(centroids, c_sq, lv, lsqn, li, q128),
        ),
        (
            "ivf_dense_f32",
            lambda: ivf_full_search_program(
                nlist, pad, dim, 128, nprobe, k, exact=True, dense=True
            )(centroids, c_sq, lv, lsqn, li, q128),
        ),
        (
            "ivf_multi_q4_f32",
            lambda: ivf_full_search_program(
                nlist, pad, dim, 128, nprobe, k, exact=True, qps_step=4
            )(centroids, c_sq, lv, lsqn, li, q128),
        ),
        (
            "ivf_dense_bf16",
            lambda: ivf_full_search_program(
                nlist, pad, dim, 128, nprobe, 20,
                db_dtype=jnp.bfloat16, dense=True,
            )(centroids, c_sq, lv_bf16, lsqn, li, q128),
        ),
        (
            "ivf_select_bf16",
            lambda: ivf_full_search_program(
                nlist, pad, dim, 128, nprobe, 20,
                db_dtype=jnp.bfloat16, dense=False,
            )(centroids, c_sq, lv_bf16, lsqn, li, q128),
        ),
        (
            "ivf_sq8_qps1",
            lambda: ivf_sq8_search_program(
                nlist, pad, dim, 128, nprobe, 20, qps_step=1
            )(centroids, c_sq, codes_l, dscale, dec_sqn, li, q128),
        ),
        (
            "ivf_sq8_qps8",
            lambda: ivf_sq8_search_program(
                nlist, pad, dim, 128, nprobe, 20, qps_step=8
            )(centroids, c_sq, codes_l, dscale, dec_sqn, li, q128),
        ),
        (
            "adc_select",
            lambda: adc_full_search_program(
                nlist, pad, dim, m, ksub, 128, nprobe, k
            )(centroids, c_sq, books, codes128, item_const, li, q128),
        ),
        (
            "adc_dense",
            lambda: adc_dense_search_program(
                nlist, pad, dim, m, ksub, 128, nprobe, 200, qps_step=1
            )(centroids, c_sq, books, codes128, item_const, li, q128),
        ),
        (
            "adc_dense_multi_q8",
            lambda: adc_dense_search_program(
                nlist, pad, dim, m, ksub, 128, nprobe, 200, qps_step=8
            )(centroids, c_sq, books, codes128, item_const, li, q128),
        ),
        (
            "adc_select_ksub16_packed",
            lambda: adc_full_search_program(
                nlist, pad, dim, m, 16, 128, nprobe, k
            )(
                centroids, c_sq,
                jax.random.normal(
                    jax.random.PRNGKey(7), (m, 16, dim // m), jnp.float32
                ),
                pack_nibbles((codes128 % 16).astype(jnp.uint8)),
                item_const, li, q128,
            ),
        ),
    ]

    # ---- sharded kernel paths on a REAL 1-chip mesh (shard_map + Pallas)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from c99_vectordb_tpu.parallel.mesh import make_mesh
    from c99_vectordb_tpu.parallel.sharded import (
        sharded_ivf_search_program,
        sharded_ivf_sq8_search_program,
    )

    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])

    def shard1(x, spec):
        return jax.device_put(x, NamedSharding(mesh1, spec))

    def sharded_f32():
        prog = sharded_ivf_search_program(
            mesh1, nlist, pad, dim, 128, nprobe, k, use_kernels=True
        )
        return prog(
            shard1(centroids, P(None, None)),
            shard1(c_sq, P(None)),
            shard1(lv, P(None, "data", None)),
            shard1(lsqn, P(None, "data")),
            shard1(li, P(None, "data")),
            shard1(q128, P(None, None)),
        )

    def sharded_sq8():
        prog = sharded_ivf_sq8_search_program(
            mesh1, nlist, pad, dim, 128, nprobe, k, 20
        )
        return prog(
            shard1(centroids, P(None, None)),
            shard1(c_sq, P(None)),
            shard1(codes_l, P(None, "data", None)),
            shard1(dscale, P(None)),
            shard1(dec_sqn, P(None, "data")),
            shard1(li, P(None, "data")),
            shard1(lv, P(None, "data", None)),
            shard1(q128, P(None, None)),
        )

    def sharded_flat_kernels():
        from c99_vectordb_tpu.parallel.sharded import sharded_search_kernels

        prog = sharded_search_kernels(mesh1, n_flat, dim, 128, k, 20)
        return prog(
            shard1(db, P("data", None)),
            shard1(flat_ids, P("data")),
            shard1(sq, P("data")),
            shard1(q128, P(None, None)),
        )

    def sharded_flat_sq8_kernels():
        from c99_vectordb_tpu.parallel.sharded import (
            sharded_search_sq8_kernels,
        )

        prog = sharded_search_sq8_kernels(
            mesh1, n_flat, dim, 128, k, 20
        )
        return prog(
            shard1(db_i8, P("data", None)),
            shard1(db, P("data", None)),
            shard1(flat_ids, P("data")),
            shard1(sq_i8, P("data")),
            shard1(scale, P(None)),
            shard1(q128, P(None, None)),
        )

    def sharded_pq_kernels():
        from c99_vectordb_tpu.parallel.sharded import sharded_pq_search_program

        prog = sharded_pq_search_program(
            mesh1, nlist, pad, dim, m, ksub, 128, nprobe, k, 200,
            use_kernels=True,
        )
        return prog(
            shard1(centroids, P(None, None)),
            shard1(c_sq, P(None)),
            shard1(books, P(None, None, None)),
            shard1(codes128, P(None, None, "data")),
            shard1(item_const, P(None, "data")),
            shard1(li, P(None, "data")),
            shard1(lv, P(None, "data", None)),
            shard1(q128, P(None, None)),
            shard1(q128, P(None, None)),
        )

    checks += [
        ("sharded_ivf_f32_kernels_1chip", sharded_f32),
        ("sharded_ivf_sq8_1chip", sharded_sq8),
        ("sharded_flat_kernels_1chip", sharded_flat_kernels),
        ("sharded_flat_sq8_1chip", sharded_flat_sq8_kernels),
        ("sharded_pq_kernels_1chip", sharded_pq_kernels),
    ]

    failures = []
    for name, fn in checks:
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — the gate reports, not raises
            print(
                f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}",
                flush=True,
            )
            failures.append(name)

    if failures:
        print(f"compile_check: {len(failures)} FAILED: {failures}")
        return 1
    print(f"compile_check: all {len(checks)} kernel variants PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
