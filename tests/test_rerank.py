"""Exact-rerank op (ops/rerank.py) vs a numpy oracle."""

import numpy as np

import jax.numpy as jnp

from c99_vectordb_tpu.ops.rerank import exact_rerank, shortlist_depth


def _setup(n=200, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    vectors = rng.standard_normal((n, dim)).astype(np.float32)
    # Non-contiguous external ids, ascending.
    ids = np.cumsum(rng.integers(1, 4, n)).astype(np.int32)
    cap = 256
    ids_search = np.full((cap,), np.iinfo(np.int32).max, np.int32)
    ids_search[:n] = ids
    vec_store = np.zeros((cap, dim), np.float32)
    vec_store[:n] = vectors
    row_of_pos = np.arange(cap, dtype=np.int32)
    return vectors, ids, vec_store, ids_search, row_of_pos


class TestExactRerank:
    def test_matches_numpy_oracle(self):
        vectors, ids, store, ids_search, row_of_pos = _setup()
        rng = np.random.default_rng(1)
        queries = rng.standard_normal((4, vectors.shape[1])).astype(np.float32)
        cand = np.stack([rng.choice(ids, 32, replace=False) for _ in range(4)])

        d, i = exact_rerank(
            jnp.asarray(store), jnp.asarray(ids_search), jnp.asarray(row_of_pos),
            jnp.asarray(cand.astype(np.int32)), jnp.asarray(queries), 5,
        )
        d, i = np.asarray(d), np.asarray(i)

        for q in range(4):
            rows = np.searchsorted(ids, cand[q])
            exact = ((vectors[rows] - queries[q]) ** 2).sum(-1)
            order = np.lexsort((cand[q], exact))[:5]
            np.testing.assert_array_equal(i[q], cand[q][order])
            np.testing.assert_allclose(d[q], exact[order], rtol=1e-5, atol=1e-5)

    def test_invalid_candidates_sort_last(self):
        vectors, ids, store, ids_search, row_of_pos = _setup()
        queries = np.zeros((1, vectors.shape[1]), np.float32)
        cand = np.full((1, 8), -1, np.int32)
        cand[0, :2] = ids[:2]
        d, i = exact_rerank(
            jnp.asarray(store), jnp.asarray(ids_search), jnp.asarray(row_of_pos),
            jnp.asarray(cand), jnp.asarray(queries), 4,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert set(i[0, :2].tolist()) == set(ids[:2].tolist())
        assert (i[0, 2:] == -1).all() and np.isinf(d[0, 2:]).all()

    def test_duplicate_candidates_keep_lowest_first(self):
        vectors, ids, store, ids_search, row_of_pos = _setup()
        queries = vectors[:1].copy()
        cand = np.array([[ids[0], ids[0], ids[1]]], np.int32)
        d, i = exact_rerank(
            jnp.asarray(store), jnp.asarray(ids_search), jnp.asarray(row_of_pos),
            jnp.asarray(cand), jnp.asarray(queries), 2,
        )
        assert np.asarray(i)[0, 0] == ids[0]

    def test_bf16_store_accepted(self):
        vectors, ids, store, ids_search, row_of_pos = _setup()
        queries = np.zeros((2, vectors.shape[1]), np.float32)
        cand = np.stack([ids[:6], ids[6:12]]).astype(np.int32)
        d, i = exact_rerank(
            jnp.asarray(store, dtype=jnp.bfloat16), jnp.asarray(ids_search),
            jnp.asarray(row_of_pos), jnp.asarray(cand), jnp.asarray(queries), 3,
        )
        assert np.asarray(d).shape == (2, 3)
        assert (np.asarray(i) >= 0).all()

    def test_permuted_row_of_pos(self):
        # Bucketed layout: store rows permuted relative to id order.
        vectors, ids, _, ids_search, _ = _setup()
        n, dim = vectors.shape
        perm = np.random.default_rng(7).permutation(n)
        store = np.zeros((256, dim), np.float32)
        store[perm] = vectors
        row_of_pos = np.zeros((256,), np.int32)
        row_of_pos[:n] = perm
        queries = vectors[:3].copy()
        cand = np.broadcast_to(ids[:10], (3, 10)).astype(np.int32).copy()
        d, i = exact_rerank(
            jnp.asarray(store), jnp.asarray(ids_search), jnp.asarray(row_of_pos),
            jnp.asarray(cand), jnp.asarray(queries), 1,
        )
        np.testing.assert_array_equal(np.asarray(i)[:, 0], ids[:3])
        np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-5)


def test_shortlist_depth():
    assert shortlist_depth(10, 1 << 20) == 40
    assert shortlist_depth(1, 1 << 20) == 31
    assert shortlist_depth(100, 1 << 20) == 400
    assert shortlist_depth(100, 64) == 64
