"""Exact-rerank op (ops/rerank.py) vs a numpy oracle — both lookup modes."""

import numpy as np
import pytest

import jax.numpy as jnp

from c99_vectordb_tpu.ops.rerank import (
    build_id_lookup,
    exact_rerank_staged,
    shortlist_depth,
)


def _setup(n=200, dim=16, seed=0, sparse=False):
    rng = np.random.default_rng(seed)
    vectors = rng.standard_normal((n, dim)).astype(np.float32)
    step_hi = 10_000 if sparse else 4  # sparse => forces searchsorted path
    ids = np.cumsum(rng.integers(1, step_hi, n)).astype(np.int32)
    cap = 256
    vec_store = np.zeros((cap, dim), np.float32)
    vec_store[:n] = vectors
    lookup = build_id_lookup(ids)
    return vectors, ids, vec_store, lookup


@pytest.mark.parametrize("sparse", [False, True])
class TestExactRerank:
    def test_matches_numpy_oracle(self, sparse):
        vectors, ids, store, lookup = _setup(sparse=sparse)
        assert lookup[0] == ("sparse" if sparse else "dense")
        rng = np.random.default_rng(1)
        queries = rng.standard_normal((4, vectors.shape[1])).astype(np.float32)
        cand = np.stack([rng.choice(ids, 32, replace=False) for _ in range(4)])

        d, i = exact_rerank_staged(
            jnp.asarray(store), lookup,
            jnp.asarray(cand.astype(np.int32)), jnp.asarray(queries), 5,
        )
        d, i = np.asarray(d), np.asarray(i)

        for q in range(4):
            rows = np.searchsorted(ids, cand[q])
            exact = ((vectors[rows] - queries[q]) ** 2).sum(-1)
            order = np.lexsort((cand[q], exact))[:5]
            np.testing.assert_array_equal(i[q], cand[q][order])
            np.testing.assert_allclose(d[q], exact[order], rtol=1e-5, atol=1e-5)

    def test_invalid_candidates_sort_last(self, sparse):
        vectors, ids, store, lookup = _setup(sparse=sparse)
        queries = np.zeros((1, vectors.shape[1]), np.float32)
        cand = np.full((1, 8), -1, np.int32)
        cand[0, :2] = ids[:2]
        d, i = exact_rerank_staged(
            jnp.asarray(store), lookup, jnp.asarray(cand), jnp.asarray(queries), 4,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert set(i[0, :2].tolist()) == set(ids[:2].tolist())
        assert (i[0, 2:] == -1).all() and np.isinf(d[0, 2:]).all()

    def test_duplicate_candidates_keep_lowest_first(self, sparse):
        vectors, ids, store, lookup = _setup(sparse=sparse)
        queries = vectors[:1].copy()
        cand = np.array([[ids[0], ids[0], ids[1]]], np.int32)
        d, i = exact_rerank_staged(
            jnp.asarray(store), lookup, jnp.asarray(cand), jnp.asarray(queries), 2,
        )
        assert np.asarray(i)[0, 0] == ids[0]

    def test_bf16_store_accepted(self, sparse):
        vectors, ids, store, lookup = _setup(sparse=sparse)
        queries = np.zeros((2, vectors.shape[1]), np.float32)
        cand = np.stack([ids[:6], ids[6:12]]).astype(np.int32)
        d, i = exact_rerank_staged(
            jnp.asarray(store, dtype=jnp.bfloat16), lookup,
            jnp.asarray(cand), jnp.asarray(queries), 3,
        )
        assert np.asarray(d).shape == (2, 3)
        assert (np.asarray(i) >= 0).all()


def test_permuted_rows_lookup():
    # Bucketed layout: store rows permuted relative to id order.
    rng = np.random.default_rng(7)
    n, dim = 50, 8
    vectors = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(0, 2 * n, 2, dtype=np.int32)  # dense-ish even ids
    perm = rng.permutation(n)
    store = np.zeros((64, dim), np.float32)
    store[perm] = vectors
    lookup = build_id_lookup(ids, perm.astype(np.int32))
    queries = vectors[:3].copy()
    cand = np.broadcast_to(ids[:10], (3, 10)).astype(np.int32).copy()
    d, i = exact_rerank_staged(
        jnp.asarray(store), lookup, jnp.asarray(cand), jnp.asarray(queries), 1,
    )
    np.testing.assert_array_equal(np.asarray(i)[:, 0], ids[:3])
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-5)


def test_empty_lookup():
    lookup = build_id_lookup(np.zeros((0,), np.int64))
    assert lookup[0] == "dense"


def test_shortlist_depth():
    assert shortlist_depth(10, 1 << 20) == 20
    assert shortlist_depth(1, 1 << 20) == 9
    assert shortlist_depth(100, 1 << 20) == 200
    assert shortlist_depth(100, 64) == 64
