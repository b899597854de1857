"""Fused Pallas score+top-k kernel vs the XLA reference path and a NumPy
oracle. Runs in interpreter mode on CPU; compiled on real TPU."""

import numpy as np
import pytest

from c99_vectordb_tpu.ops.topk_pallas import fused_topk_numpy


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def oracle(db, ids, queries, k):
    d = ((queries[:, None, :].astype(np.float64) - db[None, :, :].astype(np.float64)) ** 2).sum(-1)
    out_d = np.empty((queries.shape[0], k), np.float64)
    out_i = np.empty((queries.shape[0], k), np.int64)
    for q in range(queries.shape[0]):
        order = np.lexsort((ids, d[q]))[:k]
        out_d[q] = d[q][order]
        out_i[q] = ids[order]
    return out_d, out_i


class TestFusedTopK:
    def test_single_tile(self, rng):
        db = rng.standard_normal((700, 128)).astype(np.float32)
        ids = np.arange(700)
        q = rng.standard_normal((3, 128)).astype(np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=5, tile_n=1024)
        want_d, want_i = oracle(db, ids, q, 5)
        true_d = ((q[:, None, :] - db[i]) ** 2).sum(-1)
        np.testing.assert_allclose(true_d, want_d, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(d, want_d, rtol=1e-3, atol=1e-3)

    def test_multi_tile_carry(self, rng):
        # 4 database tiles; best neighbors scattered across tiles
        db = rng.standard_normal((4096, 64)).astype(np.float32)
        ids = np.arange(4096)
        q = rng.standard_normal((2, 64)).astype(np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=10, tile_n=1024)
        want_d, want_i = oracle(db, ids, q, 10)
        true_d = ((q[:, None, :] - db[i]) ** 2).sum(-1)
        np.testing.assert_allclose(true_d, want_d, rtol=1e-3, atol=1e-3)

    def test_duplicate_ties_lowest_id(self, rng):
        base = rng.standard_normal((32,)).astype(np.float32)
        db = np.tile(base, (2048, 1))  # every row identical
        ids = np.arange(2048)
        d, i = fused_topk_numpy(db, ids, base[None, :], k=4, tile_n=1024)
        assert i[0].tolist() == [0, 1, 2, 3]
        np.testing.assert_allclose(d[0], 0.0, atol=1e-5)

    def test_padding_rows_excluded(self, rng):
        # n=5 rows padded up to one tile of 1024: padding must never win
        db = rng.standard_normal((5, 32)).astype(np.float32) + 10.0  # far from origin
        ids = np.arange(5)
        q = np.zeros((1, 32), np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=8, tile_n=1024)
        assert set(i[0, :5].tolist()) == set(range(5))
        assert (i[0, 5:] == -1).all()
        assert np.isinf(d[0, 5:]).all()

    def test_bf16_database_high_recall(self, rng):
        import jax.numpy as jnp
        from c99_vectordb_tpu.ops.topk_pallas import fused_topk

        db = rng.standard_normal((2048, 128)).astype(np.float32)
        ids = np.arange(2048, dtype=np.int32)
        q = rng.standard_normal((4, 128)).astype(np.float32)
        sq = np.einsum("nd,nd->n", db, db).astype(np.float32)
        d16, i16 = fused_topk(
            jnp.asarray(db, dtype=jnp.bfloat16), jnp.asarray(ids),
            jnp.asarray(sq), jnp.asarray(q), 10, tile_n=1024,
        )
        want_d, want_i = oracle(db, ids, q, 10)
        i16 = np.asarray(i16)
        overlap = sum(
            len(set(i16[b].tolist()) & set(want_i[b].tolist())) for b in range(4)
        )
        assert overlap / 40 >= 0.9  # bf16 storage keeps near-exact recall

    def test_narrow_slate_lane_distinct(self, rng):
        # Later-tile improvements in DISTINCT lanes exercise the narrow
        # (128-lane slate) selection path: tile 2 holds exactly three rows
        # closer than anything in tile 1, at columns 5, 140, 200 (lanes
        # 5, 12, 72 — no collision).
        db = rng.standard_normal((512, 16)).astype(np.float32) + 8.0
        for col, scale in ((5, 0.1), (140, 0.2), (200, 0.3)):
            db[256 + col] = scale
        ids = np.arange(512)
        q = np.zeros((1, 16), np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=5, tile_n=256)
        want_d, want_i = oracle(db, ids, q, 5)
        np.testing.assert_array_equal(i[0, :3], [261, 396, 456])
        np.testing.assert_allclose(d, want_d, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(i, want_i)

    def test_collision_fallback_same_lane(self, rng):
        # Two improving rows in the SAME lane of a later tile (columns 7
        # and 135 -> both lane 7): the slate alone would lose one; the
        # collision detector must route the tile to the wide path.
        db = rng.standard_normal((512, 16)).astype(np.float32) + 8.0
        db[256 + 7] = 0.1
        db[256 + 135] = 0.2
        ids = np.arange(512)
        q = np.zeros((1, 16), np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=4, tile_n=256)
        assert i[0, :2].tolist() == [263, 391]
        want_d, want_i = oracle(db, ids, q, 4)
        np.testing.assert_array_equal(i, want_i)

    def test_narrow_cross_lane_tie_lowest_id(self):
        # Equal improving distances in DIFFERENT lanes of a later tile:
        # the narrow extraction must pick the lowest id first.
        db = np.full((512, 16), 8.0, np.float32)
        db[256 + 10] = 0.5
        db[256 + 140] = 0.5  # identical row, higher id, different lane
        ids = np.arange(512)
        q = np.zeros((1, 16), np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=3, tile_n=256)
        assert i[0, :2].tolist() == [266, 396]
        assert d[0, 0] == d[0, 1]

    def test_randomized_ties_vs_oracle(self):
        # Integer-valued vectors force frequent exact distance ties and a
        # mix of narrow/wide/collision tiles; distances stay exactly
        # representable so the comparison against the f64 oracle is exact.
        rng = np.random.default_rng(123)
        for trial in range(4):
            db = rng.integers(0, 3, (1024, 16)).astype(np.float32)
            ids = np.arange(1024)
            q = rng.integers(0, 3, (4, 16)).astype(np.float32)
            d, i = fused_topk_numpy(db, ids, q, k=7, tile_n=256)
            want_d, want_i = oracle(db, ids, q, 7)
            np.testing.assert_array_equal(i, want_i, err_msg=f"trial {trial}")
            np.testing.assert_allclose(d, want_d, atol=1e-5)

    def test_batch_padding(self, rng):
        # B=3 padded to the 8-row sublane multiple
        db = rng.standard_normal((1024, 64)).astype(np.float32)
        ids = np.arange(1024)
        q = rng.standard_normal((3, 64)).astype(np.float32)
        d, i = fused_topk_numpy(db, ids, q, k=3, tile_n=1024)
        assert d.shape == (3, 3) and i.shape == (3, 3)
        want_d, _ = oracle(db, ids, q, 3)
        np.testing.assert_allclose(d, want_d, rtol=1e-3, atol=1e-3)


def test_merge_topk_pads_narrow_candidates():
    import jax.numpy as jnp
    import numpy as np

    from c99_vectordb_tpu.ops.topk import merge_topk

    d = jnp.asarray([[3.0, 1.0], [jnp.inf, 2.0]])
    i = jnp.asarray([[7, 4], [-1, 9]], dtype=jnp.int32)
    out_d, out_i = merge_topk(d, i, 5)
    assert out_d.shape == (2, 5) and out_i.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(out_i)[0], [4, 7, -1, -1, -1])
    np.testing.assert_array_equal(np.asarray(out_i)[1], [9, -1, -1, -1, -1])
    assert np.isinf(np.asarray(out_d)[0, 2:]).all()
