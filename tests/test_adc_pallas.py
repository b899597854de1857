"""Pallas ADC kernel vs the XLA ADC path (identical estimator, different
evaluation): distances and ids must agree."""

import numpy as np
import pytest

import jax.numpy as jnp

from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex, _adc_search_program
from c99_vectordb_tpu.ops.adc_pallas import adc_full_search_program


@pytest.fixture(scope="module")
def staged_pq():
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 5.0
    points = np.concatenate(
        [c + rng.standard_normal((128, 32)).astype(np.float32) for c in centers]
    )
    ids = np.arange(points.shape[0], dtype=np.int64)
    pq = IVFPQIndex(dim=32, nlist=16, m=4, refine=False)
    pq.train(points)
    pq.add(points, ids)
    return points, pq, pq._stage()


class TestPallasADC:
    def test_matches_xla_adc(self, staged_pq):
        points, pq, staged = staged_pq
        (
            centroids, c_sq, codebooks, list_codes, list_ids,
            codes128, item_const, pad,
        ) = staged
        assert codebooks.shape[1] == 256
        rng = np.random.default_rng(5)
        queries = (points[rng.choice(len(points), 2)] + 0.1).astype(np.float32)

        xla = _adc_search_program(16, pad, 32, 4, 256, 2, 4, 5)
        d_x, i_x = xla(centroids, c_sq, codebooks, list_codes, list_ids,
                       jnp.asarray(queries))

        pallas = adc_full_search_program(16, pad, 32, 4, 256, 2, 4, 5)
        d_p, i_p = pallas(centroids, c_sq, codebooks, codes128, item_const,
                          list_ids, jnp.asarray(queries))

        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
        np.testing.assert_allclose(
            np.asarray(d_p), np.asarray(d_x), rtol=1e-3, atol=1e-2
        )

    def test_dense_variant_matches_xla(self, staged_pq):
        from c99_vectordb_tpu.ops.adc_pallas import adc_dense_search_program

        points, pq, staged = staged_pq
        (
            centroids, c_sq, codebooks, list_codes, list_ids,
            codes128, item_const, pad,
        ) = staged
        rng = np.random.default_rng(11)
        queries = (points[rng.choice(len(points), 2)] + 0.1).astype(np.float32)

        k_adc = 12
        xla = _adc_search_program(16, pad, 32, 4, 256, 2, 4, k_adc)
        d_x, i_x = xla(centroids, c_sq, codebooks, list_codes, list_ids,
                       jnp.asarray(queries))
        dense = adc_dense_search_program(16, pad, 32, 4, 256, 2, 4, k_adc)
        d_d, i_d = dense(centroids, c_sq, codebooks, codes128, item_const,
                         list_ids, jnp.asarray(queries))
        # Same candidate SET and distances; the dense variant's XLA top_k
        # tie-break can differ, so compare sorted-by-(dist, id) pairs.
        for q in range(2):
            want = sorted(zip(np.asarray(d_x)[q].round(2), np.asarray(i_x)[q]))
            got = sorted(zip(np.asarray(d_d)[q].round(2), np.asarray(i_d)[q]))
            assert [i for _, i in got] == [i for _, i in want]

    def test_item_constant_identity(self, staged_pq):
        # const = ||x_hat||^2 - ||c||^2 for each encoded item
        points, pq, staged = staged_pq
        (_, _, _, _, list_ids, _, item_const, pad) = staged
        books = pq._codebooks
        m, dsub = pq.m, pq.dim // pq.m
        li = np.asarray(list_ids)
        const = np.asarray(item_const)
        rows = np.flatnonzero(li.reshape(-1) >= 0)[:20]
        for flat in rows:
            l, s = divmod(int(flat), pad)
            rid = int(li[l, s])
            row = int(np.searchsorted(pq._ids, rid))
            code = pq._codes[row]
            y = np.concatenate([books[j][code[j]] for j in range(m)])
            c = np.asarray(pq._centroids)[pq._assign[row]]
            want = float(((c + y) ** 2).sum() - (c**2).sum())
            assert abs(const[l, s] - want) < 1e-2

    def test_multi_slot_dense_matches_single(self, staged_pq):
        # 8-query-per-step dense scan == single-slot dense scan
        # (identical candidate distances and ids, interleave undone).
        from c99_vectordb_tpu.ops.adc_pallas import (
            adc_dense_program, adc_dense_program_multi,
        )

        points, pq, staged = staged_pq
        (
            centroids, c_sq, codebooks, list_codes, list_ids,
            codes128, item_const, pad,
        ) = staged
        import jax

        rng = np.random.default_rng(3)
        b, nprobe, m, ksub = 8, 4, 4, 256
        queries = jnp.asarray(
            (points[rng.choice(len(points), b)] + 0.1).astype(np.float32)
        )
        coarse = (
            jnp.sum(queries * queries, axis=1, keepdims=True)
            + c_sq[None, :]
            - 2.0 * jnp.dot(queries, centroids.T)
        )
        neg, probes = jax.lax.top_k(-coarse, nprobe)
        pc = jnp.maximum(-neg, 0.0)
        dsub = 32 // m
        qd = jnp.einsum(
            "bjd,jcd->bjc", queries.reshape(b, m, dsub), codebooks
        )
        qd = jnp.pad(qd, ((0, 0), (0, 128 - m), (0, 0)))
        args = (probes.astype(jnp.int32), pc, qd, codes128, item_const,
                list_ids)
        d1, i1 = adc_dense_program(16, pad, m, ksub, b, nprobe)(*args)
        d8, i8 = adc_dense_program_multi(16, pad, m, ksub, b, nprobe, 8)(*args)
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
        np.testing.assert_allclose(
            np.asarray(d8), np.asarray(d1), rtol=1e-5, atol=1e-5
        )


class TestFourBitADC:
    """ksub=16 (Quick-ADC-style 4-bit subquantizers): the Pallas route
    must match the XLA ADC estimator at half the code entropy."""

    @pytest.fixture(scope="class")
    def staged_pq16(self):
        rng = np.random.default_rng(41)
        centers = rng.standard_normal((8, 32)).astype(np.float32) * 5.0
        points = np.concatenate(
            [c + rng.standard_normal((96, 32)).astype(np.float32) for c in centers]
        )
        ids = np.arange(points.shape[0], dtype=np.int64)
        pq = IVFPQIndex(dim=32, nlist=8, m=8, ksub=16, refine=False)
        pq.train(points)
        pq.add(points, ids)
        return points, pq, pq._stage()

    def test_pallas_matches_xla_at_ksub16(self, staged_pq16):
        points, pq, staged = staged_pq16
        (
            centroids, c_sq, codebooks, list_codes, list_ids,
            codes128, item_const, pad,
        ) = staged
        assert codebooks.shape[1] == 16
        rng = np.random.default_rng(7)
        queries = (points[rng.choice(len(points), 3)] + 0.1).astype(np.float32)
        xla = _adc_search_program(8, pad, 32, 8, 16, 3, 4, 5)
        d_x, i_x = xla(centroids, c_sq, codebooks, list_codes, list_ids,
                       jnp.asarray(queries))
        pallas = adc_full_search_program(8, pad, 32, 8, 16, 3, 4, 5)
        d_p, i_p = pallas(centroids, c_sq, codebooks, codes128, item_const,
                          list_ids, jnp.asarray(queries))
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
        np.testing.assert_allclose(
            np.asarray(d_p), np.asarray(d_x), rtol=1e-3, atol=1e-2
        )

    def test_refined_4bit_recall(self, staged_pq16):
        # refine rescues 4-bit quantization like it does 8-bit
        points, _, _ = staged_pq16
        ids = np.arange(points.shape[0], dtype=np.int64)
        from c99_vectordb_tpu.models.flat import FlatIndex

        flat = FlatIndex(dim=32)
        flat.add(points, ids)
        _, want = flat.search(points[:8], 5)
        pq = IVFPQIndex(dim=32, nlist=8, nprobe=8, m=8, ksub=16,
                        refine=True, refine_factor=8)
        pq.train(points)
        pq.add(points, ids)
        _, got = pq.search(points[:8], 5, nprobe=8)
        rec = sum(
            len(set(got[q].tolist()) & set(want[q].tolist()))
            for q in range(8)
        ) / want[:8].size
        assert rec >= 0.8


def test_pack_nibbles_roundtrip():
    # pack is lossless: lo nibble = even subspaces, hi = odd; rows past
    # m stay zero so the packed canvas keeps the (nlist, rows, pad) deal.
    from c99_vectordb_tpu.ops.adc_pallas import CODE_LANES, pack_nibbles

    rng = np.random.default_rng(11)
    m, pad = 6, 128
    codes = np.zeros((3, CODE_LANES, pad), np.uint8)
    codes[:, :m, :] = rng.integers(0, 16, (3, m, pad), dtype=np.uint8)
    packed = np.asarray(pack_nibbles(codes))
    assert packed.shape == (3, CODE_LANES // 2, pad)
    np.testing.assert_array_equal(packed & 15, codes[:, 0::2, :])
    np.testing.assert_array_equal(packed >> 4, codes[:, 1::2, :])
    assert (packed[:, m // 2:, :] == 0).all()


def test_item_constants_device_matches_host():
    # Device-resident build_item_constants (used by corpus-scale builds
    # to avoid pulling the (n, m) codes back to host) must agree with
    # the host reference, including the n % chunk != 0 padding path.
    from c99_vectordb_tpu.ops.adc_pallas import (
        build_item_constants, build_item_constants_device,
    )

    rng = np.random.default_rng(5)
    n, m, dsub, nlist, ksub, pad = 773, 4, 3, 5, 16, 256
    centroids = rng.standard_normal((nlist, m * dsub)).astype(np.float32)
    assign = rng.integers(0, nlist, n).astype(np.int32)
    codes = rng.integers(0, ksub, (n, m)).astype(np.uint8)
    books = rng.standard_normal((m, ksub, dsub)).astype(np.float32)
    order = np.argsort(assign, kind="stable").astype(np.int32)
    sorted_lists = assign[order]
    counts = np.bincount(assign, minlength=nlist)
    starts = np.zeros((nlist,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slots = (np.arange(n) - starts[sorted_lists]).astype(np.int32)

    host = build_item_constants(
        centroids, assign, codes, books, order, sorted_lists, slots, nlist, pad
    )
    dev = np.asarray(build_item_constants_device(
        centroids, assign, codes, books, order, sorted_lists, slots, nlist, pad
    ))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_refine_id_indexed_store_with_gapped_ids():
    # Dense-but-gapped external ids (post-deletion shape): the refine
    # store stages id-indexed (row == id, lookup ("identity",)) and search
    # results must match a brute-force oracle on the kept ids.
    rng = np.random.default_rng(9)
    points = rng.standard_normal((60, 32)).astype(np.float32)
    ids = (np.arange(60, dtype=np.int64) * 2 + 1)  # odd ids, gaps everywhere
    pq = IVFPQIndex(dim=32, nlist=2, nprobe=2, m=4, refine=True)
    pq.train(points)
    pq.add(points, ids)
    assert pq._stage_refine()[1][0] == "identity"
    q = points[17:19] + 0.01
    d, i = pq.search(q, k=5)
    exact = ((q[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    best = np.argsort(exact, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), ids[best])


def test_refine_store_not_inflated_for_wide_id_gaps():
    # Stride-64 ids pass the 4-byte dense-TABLE gate but must NOT take
    # the id-indexed VECTOR store (next_pow2(max_id) rows at dim*4 B
    # each would inflate refine memory ~64-128x — review finding).
    rng = np.random.default_rng(4)
    points = rng.standard_normal((50, 16)).astype(np.float32)
    ids = np.arange(50, dtype=np.int64) * 64
    pq = IVFPQIndex(dim=16, nlist=2, nprobe=2, m=4, refine=True)
    pq.train(points)
    pq.add(points, ids)
    vecs, lookup, _, _ = pq._stage_refine()
    assert lookup[0] != "identity"
    assert vecs.shape[0] <= 2 * 64  # pow2(ntotal)-sized positional store
    d, i = pq.search(points[5:6] + 0.01, k=3)
    assert i[0, 0] == ids[5]
