"""Flat index: exactness vs NumPy brute-force oracle, tie-breaking,
serialization round-trip, recovery semantics."""

import numpy as np
import pytest

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.storage.index_io import load_index_or_fresh, read_index, write_index


def brute_force_topk(db, ids, queries, k):
    """Oracle: ascending squared L2, ties broken by lowest id."""
    d = ((queries[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    out_d = np.empty((queries.shape[0], k), np.float32)
    out_i = np.empty((queries.shape[0], k), np.int64)
    for q in range(queries.shape[0]):
        order = np.lexsort((ids, d[q]))[:k]
        out_d[q] = d[q][order]
        out_i[q] = ids[order]
    return out_d, out_i


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestSearch:
    def test_matches_oracle(self, rng):
        db = rng.standard_normal((257, 64)).astype(np.float32)
        ids = np.arange(257, dtype=np.int64)
        queries = rng.standard_normal((5, 64)).astype(np.float32)
        index = FlatIndex(dim=64)
        index.add(db, ids)
        dists, got_ids = index.search(queries, k=10)
        want_d, want_i = brute_force_topk(db, ids, queries, 10)
        # f32 matmul-expansion vs oracle can swap near-tied neighbors;
        # assert the SELECTION is right: the true distance of each returned
        # id matches the oracle's k-th distances to within f32 noise.
        true_d = ((queries[:, None, :] - db[got_ids]) ** 2).sum(-1)  # (5, 10)
        np.testing.assert_allclose(true_d, want_d, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(dists, want_d, rtol=1e-3, atol=1e-3)
        for q in range(5):
            assert len(set(got_ids[q].tolist())) == 10  # no duplicates

    def test_duplicate_vectors_tie_break_lowest_id(self, rng):
        base = rng.standard_normal((8,)).astype(np.float32)
        db = np.stack([base, base + 1.0, base, base])  # ids 0, 1, 2, 3
        index = FlatIndex(dim=8)
        index.add(db, np.arange(4, dtype=np.int64))
        _, ids = index.search(base[None, :], k=3)
        assert ids[0].tolist() == [0, 2, 3]

    def test_k_larger_than_ntotal_pads(self, rng):
        index = FlatIndex(dim=8)
        index.add(rng.standard_normal((3, 8)).astype(np.float32), np.arange(3))
        dists, ids = index.search(rng.standard_normal((1, 8)).astype(np.float32), k=5)
        assert ids.shape == (1, 5)
        assert ids[0, 3] == -1 and ids[0, 4] == -1
        assert np.isinf(dists[0, 3:]).all()

    def test_empty_index(self):
        index = FlatIndex(dim=8)
        dists, ids = index.search(np.zeros((2, 8), np.float32), k=4)
        assert (ids == -1).all()

    def test_ranked_all_full_ordering(self, rng):
        db = rng.standard_normal((50, 16)).astype(np.float32)
        index = FlatIndex(dim=16)
        index.add(db, np.arange(50, dtype=np.int64))
        q = rng.standard_normal((16,)).astype(np.float32)
        dists, ids = index.ranked_all(q)
        assert len(ids) == 50
        assert (np.diff(dists) >= 0).all()
        assert set(ids.tolist()) == set(range(50))

    def test_incremental_add_keeps_id_order(self, rng):
        index = FlatIndex(dim=8)
        v = rng.standard_normal((6, 8)).astype(np.float32)
        index.add(v[4:], np.array([4, 5]))
        index.add(v[:4], np.arange(4))  # out-of-order add triggers re-sort
        assert index.ids().tolist() == [0, 1, 2, 3, 4, 5]
        d, i = index.search(v[2][None], k=1)
        assert i[0, 0] == 2 and d[0, 0] < 1e-5


class TestSerialization:
    def test_round_trip(self, tmp_path, rng):
        index = FlatIndex(dim=32)
        vecs = rng.standard_normal((20, 32)).astype(np.float32)
        index.add(vecs, np.arange(10, 30, dtype=np.int64))
        path = tmp_path / "db.memo"
        write_index(index, path)
        loaded = read_index(path)
        assert loaded.kind == "flat"
        assert loaded.ntotal == 20
        assert loaded.ids().tolist() == list(range(10, 30))
        q = vecs[7][None]
        np.testing.assert_array_equal(loaded.search(q, 3)[1], index.search(q, 3)[1])

    def test_missing_file_gives_fresh(self, tmp_path):
        index = load_index_or_fresh(tmp_path / "absent.memo")
        assert index.ntotal == 0

    def test_corrupt_file_gives_fresh(self, tmp_path):
        path = tmp_path / "bad.memo"
        path.write_bytes(b"garbage not an index at all")
        index = load_index_or_fresh(path)
        assert index.ntotal == 0

    def test_truncated_file_gives_fresh(self, tmp_path, rng):
        index = FlatIndex(dim=16)
        index.add(rng.standard_normal((4, 16)).astype(np.float32), np.arange(4))
        path = tmp_path / "trunc.memo"
        write_index(index, path)
        path.write_bytes(path.read_bytes()[:20])
        assert load_index_or_fresh(path).ntotal == 0

    def test_mmap_and_eager_reads_identical(self, tmp_path, rng, monkeypatch):
        """read_index memory-maps payloads by default; C99VDB_INDEX_MMAP=0
        restores the eager read_bytes path. Both must produce identical
        arrays (the mmap path exists to overlap the corpus-scale disk
        read with the host->device push — BASELINE.md round 5)."""
        from c99_vectordb_tpu.storage.index_io import read_index

        index = FlatIndex(dim=16)
        index.add(rng.standard_normal((9, 16)).astype(np.float32), np.arange(9))
        path = tmp_path / "db.memo"
        write_index(index, path)

        monkeypatch.delenv("C99VDB_INDEX_MMAP", raising=False)
        mapped = read_index(path)
        monkeypatch.setenv("C99VDB_INDEX_MMAP", "0")
        eager = read_index(path)

        base = mapped._vectors
        while base is not None and not isinstance(base, np.memmap):
            base = base.base
        assert isinstance(base, np.memmap)  # no-copy adoption of the mapped file
        assert not mapped._vectors.flags.writeable
        np.testing.assert_array_equal(np.asarray(mapped._vectors), eager._vectors)
        np.testing.assert_array_equal(np.asarray(mapped._ids), eager._ids)
        q = np.asarray(mapped._vectors[3])[None]
        np.testing.assert_array_equal(mapped.search(q, 3)[1], eager.search(q, 3)[1])


class TestScanDtype:
    def test_bf16_scan_option_exact_on_cpu(self):
        import numpy as np

        from c99_vectordb_tpu.models.flat import FlatIndex

        rng = np.random.default_rng(5)
        vectors = rng.standard_normal((300, 32)).astype(np.float32)
        ids = np.arange(300, dtype=np.int64)
        f32 = FlatIndex(dim=32)
        bf16 = FlatIndex(dim=32, scan_dtype="bfloat16")
        f32.add(vectors, ids)
        bf16.add(vectors, ids)
        q = vectors[:4] + 0.01
        d1, i1 = f32.search(q, 7)
        d2, i2 = bf16.search(q, 7)
        # CPU path scores from the f32 store either way -> identical.
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-6)

    def test_scan_dtype_round_trips(self, tmp_path):
        import numpy as np

        from c99_vectordb_tpu.models.flat import FlatIndex
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        index = FlatIndex(dim=16, scan_dtype="bfloat16")
        index.add(np.eye(16, dtype=np.float32), np.arange(16, dtype=np.int64))
        path = tmp_path / "f.memo"
        write_index(index, path)
        loaded = read_index(path)
        assert loaded.scan_dtype == "bfloat16"

    def test_int8_scan_option_exact_on_cpu(self):
        import numpy as np

        from c99_vectordb_tpu.models.flat import FlatIndex

        rng = np.random.default_rng(6)
        vectors = rng.standard_normal((300, 32)).astype(np.float32)
        ids = np.arange(300, dtype=np.int64)
        f32 = FlatIndex(dim=32)
        sq8 = FlatIndex(dim=32, scan_dtype="int8")
        f32.add(vectors, ids)
        sq8.add(vectors, ids)
        q = vectors[:4] + 0.01
        d1, i1 = f32.search(q, 7)
        d2, i2 = sq8.search(q, 7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-6)

    def test_int8_staging_codes_and_norms(self):
        import numpy as np

        from c99_vectordb_tpu.models.flat import FlatIndex

        rng = np.random.default_rng(7)
        vectors = rng.standard_normal((100, 16)).astype(np.float32)
        index = FlatIndex(dim=16, scan_dtype="int8")
        index.add(vectors, np.arange(100, dtype=np.int64))
        staged = index._staged()
        codes, scan_norms, scale = staged[5], staged[6], staged[7]
        codes = np.asarray(codes)
        scale = np.asarray(scale)
        assert codes.dtype == np.int8 and codes.shape[1] == 16
        decoded = codes[:100].astype(np.float32) * scale
        # symmetric per-dim SQ8: max abs error is half a step per dim
        step = scale
        assert np.all(np.abs(decoded - vectors) <= step / 2 + 1e-6)
        np.testing.assert_allclose(
            np.asarray(scan_norms)[:100],
            np.einsum("nd,nd->n", decoded, decoded),
            rtol=1e-5,
        )
        assert np.isinf(np.asarray(scan_norms)[100:]).all()

    def test_int8_fused_kernel_interpret(self):
        # Integer-valued vectors quantize losslessly (scale folds out),
        # so the int8 kernel path must return the exact oracle ids.
        import numpy as np

        from c99_vectordb_tpu.ops.topk_pallas import fused_topk
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        db = rng.integers(-40, 40, (2048, 16)).astype(np.float32)
        codes = db.astype(np.int8)  # scale == 1 per dim
        sq = np.einsum("nd,nd->n", db, db).astype(np.float32)
        q = rng.integers(-40, 40, (3, 16)).astype(np.float32)
        d, i = fused_topk(
            jnp.asarray(codes), jnp.arange(2048, dtype=jnp.int32),
            jnp.asarray(sq), jnp.asarray(q), 5, tile_n=1024,
        )
        full = ((q[:, None, :] - db[None]) ** 2).sum(-1)
        want = np.argsort(full, axis=1, kind="stable")[:, :5]
        np.testing.assert_array_equal(np.asarray(i), want)

    def test_invalid_scan_dtype_rejected(self):
        import pytest

        from c99_vectordb_tpu.models.flat import FlatIndex

        with pytest.raises(ValueError, match="scan_dtype"):
            FlatIndex(dim=16, scan_dtype="float16")
