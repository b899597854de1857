"""IVF-Flat and IVF-PQ: k-means quality, recall vs exact search,
serialization, and the nprobe sweep contract."""

import numpy as np
import pytest

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex
from c99_vectordb_tpu.ops.kmeans import assign_clusters, train_kmeans
from c99_vectordb_tpu.storage.index_io import read_index, write_index


@pytest.fixture(scope="module")
def clustered_data():
    """Well-separated Gaussian blobs: k-means should recover structure."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 10.0
    points = np.concatenate(
        [c + rng.standard_normal((200, 32)).astype(np.float32) for c in centers]
    )
    ids = np.arange(points.shape[0], dtype=np.int64)
    return points, ids, centers


def recall_at_k(index, flat, queries, k, **kw):
    _, approx = index.search(queries, k, **kw)
    _, exact = flat.search(queries, k)
    hits = sum(
        len(set(approx[q].tolist()) & set(exact[q].tolist()))
        for q in range(queries.shape[0])
    )
    return hits / (queries.shape[0] * k)


class TestKMeans:
    def test_recovers_separated_blobs(self, clustered_data):
        points, _, centers = clustered_data
        got = train_kmeans(points, 16, iters=15, seed=0)
        # every true center has a learned centroid within blob radius
        d = ((centers[:, None, :] - got[None, :, :]) ** 2).sum(-1)
        assert (d.min(axis=1) < 32.0 * 4).all()

    def test_assignment_consistency(self, clustered_data):
        points, _, _ = clustered_data
        cents = train_kmeans(points, 8, iters=5, seed=1)
        assign = assign_clusters(points, cents)
        d = ((points[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(assign, d.argmin(axis=1))

    def test_deterministic(self, clustered_data):
        points, _, _ = clustered_data
        a = train_kmeans(points[:500], 8, iters=3, seed=7)
        b = train_kmeans(points[:500], 8, iters=3, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_too_few_points_raises(self):
        with pytest.raises(ValueError, match="at least"):
            train_kmeans(np.zeros((3, 8), np.float32), 8)

    def test_device_array_input_matches_numpy(self, clustered_data):
        import jax.numpy as jnp

        points, _, _ = clustered_data
        host = train_kmeans(points[:512], 8, iters=3, seed=7)
        dev = train_kmeans(jnp.asarray(points[:512]), 8, iters=3, seed=7)
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_multi_matches_per_subspace(self, clustered_data):
        from c99_vectordb_tpu.ops.kmeans import (
            assign_clusters_multi,
            train_kmeans_multi,
        )

        points, _, _ = clustered_data
        subs = np.stack([points[:512, :16], points[:512, 16:]])  # (2, 512, 16)
        books = train_kmeans_multi(subs, 8, iters=4, seed=3)
        assert books.shape == (2, 8, 16)
        single0 = train_kmeans(subs[0], 8, iters=4, seed=3)
        np.testing.assert_allclose(books[0], single0, rtol=1e-4, atol=1e-4)
        assigns = assign_clusters_multi(subs, books)
        assert assigns.shape == (2, 512)
        np.testing.assert_array_equal(assigns[0], assign_clusters(subs[0], books[0]))


class TestIVFFlat:
    def test_full_probe_matches_exact(self, clustered_data):
        points, ids, _ = clustered_data
        rng = np.random.default_rng(5)
        queries = points[rng.choice(len(points), 8)] + 0.01
        flat = FlatIndex(dim=32)
        flat.add(points, ids)
        ivf = IVFFlatIndex(dim=32, nlist=16, nprobe=16)
        ivf.train(points)
        ivf.add(points, ids)
        assert recall_at_k(ivf, flat, queries, 10) == 1.0

    def test_recall_improves_with_nprobe(self, clustered_data):
        points, ids, _ = clustered_data
        rng = np.random.default_rng(6)
        queries = rng.standard_normal((16, 32)).astype(np.float32) * 5.0
        flat = FlatIndex(dim=32)
        flat.add(points, ids)
        ivf = IVFFlatIndex(dim=32, nlist=16)
        ivf.train(points)
        ivf.add(points, ids)
        r1 = recall_at_k(ivf, flat, queries, 10, nprobe=1)
        r16 = recall_at_k(ivf, flat, queries, 10, nprobe=16)
        assert r16 == 1.0
        assert r16 >= r1

    def test_ranked_all_is_exact(self, clustered_data):
        points, ids, _ = clustered_data
        ivf = IVFFlatIndex(dim=32, nlist=8)
        ivf.train(points[:512])
        ivf.add(points[:512], ids[:512])
        q = points[3]
        dists, got = ivf.ranked_all(q)
        assert got[0] == 3 and dists[0] < 1e-4
        assert (np.diff(dists) >= -1e-5).all()

    def test_round_trip(self, tmp_path, clustered_data):
        points, ids, _ = clustered_data
        ivf = IVFFlatIndex(dim=32, nlist=8, nprobe=4)
        ivf.train(points[:512])
        ivf.add(points[:512], ids[:512])
        write_index(ivf, tmp_path / "ivf.memo")
        loaded = read_index(tmp_path / "ivf.memo")
        assert loaded.kind == "ivf_flat"
        q = points[5][None]
        np.testing.assert_array_equal(loaded.search(q, 3)[1], ivf.search(q, 3)[1])

    def test_untrained_empty_search(self):
        ivf = IVFFlatIndex(dim=16)
        d, i = ivf.search(np.zeros((1, 16), np.float32), 3)
        assert (i == -1).all()


class TestIVFPQ:
    def test_high_recall_on_clustered_data(self, clustered_data):
        points, ids, _ = clustered_data
        rng = np.random.default_rng(9)
        queries = points[rng.choice(len(points), 8)] + 0.01
        flat = FlatIndex(dim=32)
        flat.add(points, ids)
        pq = IVFPQIndex(dim=32, nlist=16, nprobe=16, m=8)
        pq.train(points)
        pq.add(points, ids)
        # Standard PQ eval: the true nearest neighbor must appear in the
        # ADC top-10 (recall@1-in-10), and overall top-10 overlap stays
        # well above chance despite 4x compression of within-blob detail.
        _, approx = pq.search(queries, 10)
        _, exact = flat.search(queries, 1)
        assert all(
            exact[q, 0] in approx[q].tolist() for q in range(queries.shape[0])
        )
        assert recall_at_k(pq, flat, queries, 10) >= 0.5

    def test_compression(self, clustered_data):
        points, ids, _ = clustered_data
        pq = IVFPQIndex(dim=32, nlist=8, m=4)
        pq.train(points[:512])
        pq.add(points[:512], ids[:512])
        assert pq.code_bytes_per_vector == 4  # vs 128 bytes raw f32
        assert pq._codes.shape == (512, 4)
        assert pq._codes.dtype == np.uint8

    def test_ranked_all_orders_by_adc(self, clustered_data):
        points, ids, _ = clustered_data
        pq = IVFPQIndex(dim=32, nlist=8, m=8)
        pq.train(points[:512])
        pq.add(points[:512], ids[:512])
        dists, got = pq.ranked_all(points[7])
        assert len(got) == 512
        assert (np.diff(dists) >= -1e-5).all()
        assert 7 in got[:5].tolist()  # own record ranks near the top

    def test_round_trip(self, tmp_path, clustered_data):
        points, ids, _ = clustered_data
        pq = IVFPQIndex(dim=32, nlist=8, nprobe=8, m=4)
        pq.train(points[:512])
        pq.add(points[:512], ids[:512])
        write_index(pq, tmp_path / "pq.memo")
        loaded = read_index(tmp_path / "pq.memo")
        assert loaded.kind == "ivf_pq"
        q = points[11][None]
        np.testing.assert_array_equal(loaded.search(q, 5)[1], pq.search(q, 5)[1])

    def test_dim_divisibility_enforced(self):
        with pytest.raises(ValueError, match="divisible"):
            IVFPQIndex(dim=30, m=8)

    def test_refine_beats_pure_adc(self, clustered_data):
        points, ids, _ = clustered_data
        rng = np.random.default_rng(21)
        queries = points[rng.choice(len(points), 8)] + 0.01
        flat = FlatIndex(dim=32)
        flat.add(points, ids)

        pure = IVFPQIndex(dim=32, nlist=16, nprobe=16, m=8, refine=False)
        pure.train(points)
        pure.add(points, ids)
        refined = IVFPQIndex(dim=32, nlist=16, nprobe=16, m=8, refine=True)
        refined.train(points)
        refined.add(points, ids)

        r_pure = recall_at_k(pure, flat, queries, 10)
        r_refined = recall_at_k(refined, flat, queries, 10)
        assert r_refined >= r_pure
        assert r_refined >= 0.9  # exact re-rank of ADC top-40

    def test_refine_round_trips(self, tmp_path, clustered_data):
        points, ids, _ = clustered_data
        pq = IVFPQIndex(dim=32, nlist=8, m=4, refine=True)
        pq.train(points[:512])
        pq.add(points[:512], ids[:512])
        write_index(pq, tmp_path / "rq.memo")
        loaded = read_index(tmp_path / "rq.memo")
        assert loaded.refine is True
        q = points[3][None]
        np.testing.assert_array_equal(loaded.search(q, 5)[1], pq.search(q, 5)[1])
