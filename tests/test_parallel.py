"""Multi-chip sharded search + distributed k-means on the 8-virtual-device
CPU mesh (same code path as a real ICI mesh)."""

import numpy as np
import pytest

import jax

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.ops.kmeans import train_kmeans
from c99_vectordb_tpu.parallel import (
    ShardedFlatIndex,
    make_mesh,
    sharded_kmeans_step,
    sharded_search_2d,
)
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vectors = rng.standard_normal((1000, 64)).astype(np.float32)
    ids = np.arange(1000, dtype=np.int64)
    queries = rng.standard_normal((6, 64)).astype(np.float32)
    return vectors, ids, queries


def test_eight_virtual_devices():
    assert jax.device_count() == 8


class TestShardedSearch:
    def test_matches_single_chip(self, corpus):
        vectors, ids, queries = corpus
        flat = FlatIndex(dim=64)
        flat.add(vectors, ids)
        want_d, want_i = flat.search(queries, 10)

        mesh = make_mesh(n_data=8)
        sharded = ShardedFlatIndex(dim=64, mesh=mesh)
        sharded.load(vectors, ids)
        got_d, got_i = sharded.search(queries, 10)

        np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-3)
        # selection identical up to f32 near-ties: check true distances
        true_got = ((queries[:, None, :] - vectors[got_i]) ** 2).sum(-1)
        np.testing.assert_allclose(true_got, want_d, rtol=1e-3, atol=1e-3)

    def test_k_spanning_shards(self, corpus):
        # k bigger than any single shard's row count: merge must pull
        # everything and pad the tail with (-1, inf)
        vectors, ids, _ = corpus
        mesh = make_mesh(n_data=8)
        sharded = ShardedFlatIndex(dim=64, mesh=mesh)
        sharded.load(vectors[:20], ids[:20])
        d, i = sharded.search(vectors[:1], k=30)
        assert set(i[0, :20].tolist()) == set(range(20))
        assert (i[0, 20:] == -1).all()
        assert np.isinf(d[0, 20:]).all()

    def test_cross_shard_tie_break(self):
        base = np.ones((1, 16), np.float32)
        vectors = np.tile(base, (64, 1))  # identical rows land on all shards
        ids = np.arange(64, dtype=np.int64)
        mesh = make_mesh(n_data=8)
        sharded = ShardedFlatIndex(dim=16, mesh=mesh)
        sharded.load(vectors, ids)
        _, i = sharded.search(base, k=8)
        assert i[0].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]

    def test_empty(self):
        mesh = make_mesh(n_data=8)
        sharded = ShardedFlatIndex(dim=16, mesh=mesh)
        d, i = sharded.search(np.zeros((2, 16), np.float32), k=3)
        assert (i == -1).all()


class TestShardedIVF:
    def test_full_probe_matches_flat(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, queries = corpus
        flat = FlatIndex(dim=64)
        flat.add(vectors, ids)
        want_d, _ = flat.search(queries, 10)

        mesh = make_mesh(n_data=8)
        ivf = ShardedIVFIndex(dim=64, nlist=16, nprobe=16, mesh=mesh)
        ivf.load(vectors, ids)
        got_d, got_i = ivf.search(queries, 10, nprobe=16)
        # probing every list == exact search
        true_got = ((queries[:, None, :] - vectors[got_i]) ** 2).sum(-1)
        np.testing.assert_allclose(true_got, want_d, rtol=1e-3, atol=1e-3)

    def test_partial_probe_recall(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, queries = corpus
        flat = FlatIndex(dim=64)
        flat.add(vectors, ids)
        _, want_i = flat.search(queries, 10)

        mesh = make_mesh(n_data=8)
        ivf = ShardedIVFIndex(dim=64, nlist=16, mesh=mesh)
        ivf.load(vectors, ids)
        _, lo = ivf.search(queries, 10, nprobe=2)
        _, hi = ivf.search(queries, 10, nprobe=8)

        def rec(i):
            return sum(
                len(set(i[q].tolist()) & set(want_i[q].tolist()))
                for q in range(len(queries))
            ) / want_i.size

        assert rec(hi) >= rec(lo)
        assert rec(hi) > 0.3

    def test_empty(self):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        mesh = make_mesh(n_data=8)
        ivf = ShardedIVFIndex(dim=16, mesh=mesh)
        d, i = ivf.search(np.zeros((2, 16), np.float32), k=3)
        assert (i == -1).all()


class TestShardedIVFPQ:
    def test_refined_matches_single_chip(self, corpus):
        from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex

        vectors, ids, queries = corpus
        single = IVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, refine=True)
        single.train(vectors)
        single.add(vectors, ids)
        want_d, want_i = single.search(queries, 5, nprobe=16)

        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, mesh=mesh)
        pq.load(vectors, ids)
        got_d, got_i = pq.search(queries, 5, nprobe=16)
        # Same training (same seeds/kernels) + exact refine -> same top-5
        # whenever the ADC shortlists agree; require strong recall overlap
        # and exactly-correct distances for whatever ids were returned.
        true_got = ((queries[:, None, :] - vectors[got_i]) ** 2).sum(-1)
        np.testing.assert_allclose(got_d, true_got, rtol=1e-4, atol=1e-4)
        overlap = sum(
            len(set(got_i[q].tolist()) & set(want_i[q].tolist()))
            for q in range(len(queries))
        ) / want_i.size
        assert overlap >= 0.8

    def test_refine_recall_beats_adc(self, corpus):
        from c99_vectordb_tpu.models.flat import FlatIndex as _F
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex

        vectors, ids, queries = corpus
        flat = _F(dim=64)
        flat.add(vectors, ids)
        _, want_i = flat.search(queries, 5)

        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, refine_factor=8, mesh=mesh)
        pq.load(vectors, ids)
        _, got_i = pq.search(queries, 5, nprobe=16)
        rec = sum(
            len(set(got_i[q].tolist()) & set(want_i[q].tolist()))
            for q in range(len(queries))
        ) / want_i.size
        assert rec >= 0.8  # exact refine rescues PQ quantization at this scale

    def test_incremental_add(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(dim=64, nlist=16, m=8, mesh=mesh)
        pq.add(vectors[:500], ids[:500])
        assert pq.ntotal == 500
        pq.add(vectors[500:], ids[500:])
        assert pq.ntotal == 1000
        d, i = pq.search(queries[:2], 3, nprobe=16)
        assert (i >= 0).all()


class TestShardedSerialization:
    def test_round_trips(self, corpus, tmp_path):
        from c99_vectordb_tpu.parallel import (
            ShardedFlatIndex,
            ShardedIVFIndex,
            ShardedIVFPQIndex,
        )
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        builders = [
            lambda: ShardedFlatIndex(dim=64, mesh=mesh),
            lambda: ShardedIVFIndex(dim=64, nlist=16, nprobe=16, mesh=mesh),
            lambda: ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, mesh=mesh),
        ]
        for build in builders:
            index = build()
            index.add(vectors, ids)
            want_d, want_i = index.search(queries, 5)
            path = tmp_path / f"{index.kind}.memo"
            write_index(index, path)
            loaded = read_index(path)
            assert type(loaded) is type(index)
            assert loaded.ntotal == index.ntotal
            got_d, got_i = loaded.search(queries, 5)
            np.testing.assert_array_equal(got_i, want_i)
            np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)

    def test_incremental_add_flat(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        inc = ShardedFlatIndex(dim=64, mesh=mesh)
        # out-of-order adds re-sort by id, matching a bulk load
        inc.add(vectors[500:], ids[500:])
        inc.add(vectors[:500], ids[:500])
        bulk = ShardedFlatIndex(dim=64, mesh=mesh)
        bulk.load(vectors, ids)
        d1, i1 = inc.search(queries, 10)
        d2, i2 = bulk.search(queries, 10)
        np.testing.assert_array_equal(i1, i2)

    def test_ranked_all(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        sharded = ShardedFlatIndex(dim=64, mesh=mesh)
        sharded.add(vectors, ids)
        d, i = sharded.ranked_all(queries[0])
        assert d.shape == (1000,) and i.shape == (1000,)
        assert (np.diff(d) >= -1e-5).all()


class TestTwoLevelMerge:
    def test_identical_to_flat_merge(self, corpus):
        from c99_vectordb_tpu.parallel import (
            make_host_chip_mesh,
            sharded_search_2level,
            sharded_search_program,
        )

        vectors, ids, queries = corpus
        n, dim = 1024, 64
        db = np.zeros((n, dim), np.float32)
        db[:1000] = vectors
        idp = np.full((n,), -1, np.int32)
        idp[:1000] = ids.astype(np.int32)
        sq = np.einsum("nd,nd->n", db, db).astype(np.float32)

        mesh1 = make_mesh(n_data=8)
        flat_prog = sharded_search_program(mesh1, n, dim, queries.shape[0], 7)
        want_d, want_i = flat_prog(
            jax.device_put(db, NamedSharding(mesh1, P("data", None))),
            jax.device_put(idp, NamedSharding(mesh1, P("data"))),
            jax.device_put(sq, NamedSharding(mesh1, P("data"))),
            queries,
        )

        mesh2 = make_host_chip_mesh(2, 4)
        two_prog = sharded_search_2level(mesh2, n, dim, queries.shape[0], 7)
        got_d, got_i = two_prog(
            jax.device_put(db, NamedSharding(mesh2, P(("host", "chip"), None))),
            jax.device_put(idp, NamedSharding(mesh2, P(("host", "chip")))),
            jax.device_put(sq, NamedSharding(mesh2, P(("host", "chip")))),
            queries,
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_d), np.asarray(want_d), rtol=1e-6, atol=1e-6
        )

    def test_4x2_factoring(self, corpus):
        from c99_vectordb_tpu.parallel import (
            make_host_chip_mesh,
            sharded_search_2level,
        )
        from c99_vectordb_tpu.models.flat import FlatIndex as _F

        vectors, ids, queries = corpus
        flat = _F(dim=64)
        flat.add(vectors, ids)
        want_d, want_i = flat.search(queries, 5)

        n = 1024
        db = np.zeros((n, 64), np.float32)
        db[:1000] = vectors
        idp = np.full((n,), -1, np.int32)
        idp[:1000] = ids.astype(np.int32)
        sq = np.einsum("nd,nd->n", db, db).astype(np.float32)
        mesh = make_host_chip_mesh(4, 2)
        prog = sharded_search_2level(mesh, n, 64, queries.shape[0], 5)
        got_d, got_i = prog(
            jax.device_put(db, NamedSharding(mesh, P(("host", "chip"), None))),
            jax.device_put(idp, NamedSharding(mesh, P(("host", "chip")))),
            jax.device_put(sq, NamedSharding(mesh, P(("host", "chip")))),
            queries,
        )
        np.testing.assert_array_equal(np.asarray(got_i), want_i.astype(np.int64))
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-3, atol=1e-3)


class TestSharded2D:
    def test_data_model_mesh_matches_oracle(self, corpus):
        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=4, n_model=2)
        n, dim = 1024, 64
        db = np.zeros((n, dim), np.float32)
        db[:1000] = vectors
        idp = np.full((n,), -1, np.int32)
        idp[:1000] = ids.astype(np.int32)

        program = sharded_search_2d(mesh, n, dim, queries.shape[0], 5)
        d, i = program(
            jax.device_put(db, NamedSharding(mesh, P("data", "model"))),
            jax.device_put(idp, NamedSharding(mesh, P("data"))),
            jax.device_put(queries, NamedSharding(mesh, P(None, "model"))),
        )
        flat = FlatIndex(dim=64)
        flat.add(vectors, ids)
        want_d, _ = flat.search(queries, 5)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-3)


class TestDistributedKMeans:
    def test_step_matches_single_device_lloyd(self):
        rng = np.random.default_rng(2)
        data = rng.standard_normal((512, 32)).astype(np.float32)
        mesh = make_mesh(n_data=8)
        k = 8
        init = data[:k].copy()

        step = sharded_kmeans_step(mesh, 512, 32, k)
        centroids = jax.device_put(init, NamedSharding(mesh, P(None, None)))
        data_dev = jax.device_put(data, NamedSharding(mesh, P("data", None)))
        valid = jax.device_put(
            np.ones((512,), np.float32), NamedSharding(mesh, P("data"))
        )
        for _ in range(5):
            centroids = step(data_dev, valid, centroids)
        got = np.asarray(centroids)

        # single-device oracle: same Lloyd updates
        cents = init.copy()
        for _ in range(5):
            d = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(k):
                pts = data[assign == c]
                if len(pts):
                    cents[c] = pts.mean(0)
        np.testing.assert_allclose(got, cents, rtol=1e-3, atol=1e-3)

    def test_quality_parity_with_ops_kmeans(self):
        rng = np.random.default_rng(4)
        centers = rng.standard_normal((8, 16)).astype(np.float32) * 8
        data = np.concatenate(
            [c + rng.standard_normal((64, 16)).astype(np.float32) for c in centers]
        )
        single = train_kmeans(data, 8, iters=8, seed=0)
        mesh = make_mesh(n_data=8)
        step = sharded_kmeans_step(mesh, 512, 16, 8)
        cents = jax.device_put(single[:8] * 0 + data[:8], NamedSharding(mesh, P(None, None)))
        data_dev = jax.device_put(data, NamedSharding(mesh, P("data", None)))
        valid = jax.device_put(np.ones((512,), np.float32), NamedSharding(mesh, P("data")))
        for _ in range(8):
            cents = step(data_dev, valid, cents)
        # distributed training also recovers the blob structure
        d = ((centers[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(-1)
        assert (d.min(axis=1) < 16.0).sum() >= 6


class TestCodeReviewRegressions:
    """Round-2 review findings: k > ntotal, cross-device-count reload."""

    def test_sharded_pq_k_exceeds_ntotal(self):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex

        rng = np.random.default_rng(0)
        vectors = rng.standard_normal((5, 16)).astype(np.float32)
        ids = np.arange(5, dtype=np.int64)
        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(dim=16, nlist=8, m=4, mesh=mesh)
        pq.load(vectors, ids)
        d, i = pq.search(vectors[:2], k=10)
        assert d.shape == (2, 10) and i.shape == (2, 10)
        assert set(i[0][i[0] >= 0].tolist()) <= set(range(5))
        assert (i[:, 5:] == -1).all()

    def test_sharded_flat_k_exceeds_ntotal(self):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex

        rng = np.random.default_rng(1)
        mesh = make_mesh(n_data=8)
        idx = ShardedFlatIndex(dim=16, mesh=mesh)
        idx.add(rng.standard_normal((3, 16)).astype(np.float32),
                np.arange(3, dtype=np.int64))
        d, i = idx.search(np.zeros((1, 16), np.float32), k=7)
        assert i.shape == (1, 7) and (i[0, 3:] == -1).all()

    @pytest.mark.parametrize("kind", ["sharded_ivf", "sharded_ivf_pq"])
    def test_reload_on_different_device_count(self, corpus, tmp_path, kind):
        # Saved on an 8-shard mesh (nlist divisible by 8), reloaded onto a
        # 3-device mesh: staging must re-pad the centroid table.
        from c99_vectordb_tpu.parallel import (
            ShardedIVFIndex,
            ShardedIVFPQIndex,
        )
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        vectors, ids, queries = corpus
        mesh8 = make_mesh(n_data=8)
        if kind == "sharded_ivf":
            index = ShardedIVFIndex(dim=64, nlist=16, nprobe=16, mesh=mesh8)
        else:
            index = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, mesh=mesh8)
        index.load(vectors, ids)
        want_d, want_i = index.search(queries, 5)
        path = tmp_path / f"{kind}.memo"
        write_index(index, path)

        loaded = read_index(path)
        loaded.mesh = make_mesh(n_data=3, devices=jax.devices()[:3])
        got_d, got_i = loaded.search(queries, 5)
        # Same candidates regardless of shard count (sentinel lists never
        # win probes or assignments).
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)


class TestSlotSharding:
    """Round-3 owner-aware contract (VERDICT round 2, next #1/#2): the
    slot-sharded layout divides per-chip scan work by the mesh size with
    results bit-identical to the single-chip family."""

    def test_scan_rows_scale_inverse_with_shards(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, _ = corpus
        rows = {}
        for s in (1, 2, 4, 8):
            mesh = make_mesh(n_data=s, devices=jax.devices()[:s])
            ivf = ShardedIVFIndex(dim=64, nlist=16, nprobe=4, mesh=mesh)
            ivf.load(vectors, ids)
            stats = ivf.scan_rows_per_chip(b=6)
            assert stats["shards"] == s
            rows[s] = stats["rows_per_chip"]
        # per-chip work shrinks with the mesh; 8 shards scan ~1/8 of the
        # single-chip rows (exact up to the per-chip sublane padding)
        assert rows[2] <= rows[1] / 2 * 1.5
        assert rows[8] <= rows[1] / 8 * 2.0
        assert rows[8] < rows[4] < rows[2] < rows[1]

    def test_results_identical_to_single_chip_ivf(self, corpus):
        from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, queries = corpus
        single = IVFFlatIndex(dim=64, nlist=16, nprobe=4)
        single.train(vectors, iters=8)
        single.add(vectors, ids)

        mesh = make_mesh(n_data=8)
        sharded = ShardedIVFIndex(dim=64, nlist=16, nprobe=4, mesh=mesh)
        sharded.load(vectors, ids)

        for nprobe in (1, 4, 16):
            want_d, want_i = single.search(queries, 10, nprobe=nprobe)
            got_d, got_i = sharded.search(queries, 10, nprobe=nprobe)
            # same centroids (same kmeans seed/iters) -> same probes ->
            # same candidate set; f32 scoring formula identical -> same
            # (distance, id) lexicographic order.
            np.testing.assert_array_equal(got_i, want_i)
            np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)

    def test_sq8_scan_matches_exact(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
        exact = ShardedIVFIndex(dim=64, nlist=16, nprobe=16, mesh=mesh)
        exact.load(vectors, ids)
        want_d, want_i = exact.search(queries, 5, nprobe=16)

        sq8 = ShardedIVFIndex(
            dim=64, nlist=16, nprobe=16, scan_dtype="int8", mesh=mesh
        )
        sq8.load(vectors, ids)
        got_d, got_i = sq8.search(queries, 5, nprobe=16)
        # int8 scan shortlists approximately; the per-shard exact f32
        # rerank restores the exact top-5.
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)

    def test_sq8_rejects_bad_combo_and_round_trips(self, corpus, tmp_path):
        from c99_vectordb_tpu.parallel import ShardedIVFIndex
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        with pytest.raises(ValueError, match="int8"):
            ShardedIVFIndex(dim=64, scan_dtype="float32", rerank_dtype="bfloat16")

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        sq8 = ShardedIVFIndex(
            dim=64, nlist=16, nprobe=16, scan_dtype="int8", mesh=mesh
        )
        sq8.load(vectors, ids)
        want_d, want_i = sq8.search(queries, 5)
        path = tmp_path / "sq8.memo"
        write_index(sq8, path)
        loaded = read_index(path)
        assert loaded.scan_dtype == "int8"
        got_d, got_i = loaded.search(queries, 5)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)

    def test_pq_rows_scale_inverse_with_shards(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex

        vectors, ids, _ = corpus
        rows = {}
        for s in (1, 8):
            mesh = make_mesh(n_data=s, devices=jax.devices()[:s])
            pq = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=4, m=8, mesh=mesh)
            pq.load(vectors, ids)
            rows[s] = pq.scan_rows_per_chip(b=6)["rows_per_chip"]
        assert rows[8] <= rows[1] / 8 * 2.0

    def test_kernel_path_matches_jnp_path(self, corpus):
        # use_kernels=True is the real-mesh TPU route; interpret mode
        # checks its semantics (Mosaic lowering itself is checked by
        # benchmarks/compile_check.py on the chip).
        from c99_vectordb_tpu.parallel import ShardedIVFIndex
        from c99_vectordb_tpu.parallel.sharded import (
            sharded_ivf_search_program,
        )

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        ivf = ShardedIVFIndex(dim=64, nlist=16, nprobe=4, mesh=mesh)
        ivf.load(vectors, ids)
        want_d, want_i = ivf.search(queries, 10, nprobe=4)
        staged = ivf._stage()
        nlist, pad_local = ivf._params
        prog = sharded_ivf_search_program(
            mesh, nlist, pad_local, 64, queries.shape[0], 4, 10,
            use_kernels=True,
        )
        q = jax.device_put(queries, NamedSharding(mesh, P(None, None)))
        d, i = prog(*staged, q)
        np.testing.assert_array_equal(np.asarray(i), want_i)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5, atol=1e-5)

    def test_flat_kernel_route_matches_xla_route(self, corpus):
        # The TPU flat route (fused kernel + per-shard exact rerank) in
        # interpret mode must match the XLA shard_map route exactly.
        from c99_vectordb_tpu.parallel import ShardedFlatIndex
        from c99_vectordb_tpu.parallel.sharded import (
            sharded_search_kernels,
        )

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        idx = ShardedFlatIndex(dim=64, mesh=mesh)
        idx.load(vectors, ids)
        want_d, want_i = idx.search(queries, 10)  # XLA route on CPU
        db, idp, sq = idx._stage()[:3]
        per = db.shape[0] // 8
        ks = min(20, per, 1024)
        prog = sharded_search_kernels(
            mesh, db.shape[0], 64, queries.shape[0], 10, ks
        )
        q = jax.device_put(queries, NamedSharding(mesh, P(None, None)))
        d, i = prog(db, idp, sq, q)
        np.testing.assert_array_equal(np.asarray(i), want_i)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5, atol=1e-5)

    def test_flat_sq8_kernel_route_matches_exact(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex
        from c99_vectordb_tpu.parallel.sharded import (
            sharded_search_sq8_kernels,
        )

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        idx = ShardedFlatIndex(dim=64, scan_dtype="int8", mesh=mesh)
        idx.load(vectors, ids)
        want_d, want_i = idx.search(queries, 10)  # CPU: exact XLA route
        codes, dec_sq, scale = idx._stage()[3:]
        db, idp, _ = idx._stage()[:3]
        per = db.shape[0] // 8
        prog = sharded_search_sq8_kernels(
            mesh, db.shape[0], 64, queries.shape[0], 10, min(20, per)
        )
        q = jax.device_put(queries, NamedSharding(mesh, P(None, None)))
        d, i = prog(codes, db, idp, dec_sq, scale, q)
        np.testing.assert_array_equal(np.asarray(i), want_i)
        np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5, atol=1e-5)

    def test_flat_sq8_round_trips(self, corpus, tmp_path):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        idx = ShardedFlatIndex(dim=64, scan_dtype="int8", mesh=mesh)
        idx.load(vectors, ids)
        want_d, want_i = idx.search(queries, 5)
        path = tmp_path / "sflat8.memo"
        write_index(idx, path)
        loaded = read_index(path)
        assert loaded.scan_dtype == "int8"
        got_d, got_i = loaded.search(queries, 5)
        np.testing.assert_array_equal(got_i, want_i)

    def test_ivf_two_level_mesh_matches_data_mesh(self, corpus):
        # ShardedIVFIndex on a ("host", "chip") mesh: hierarchical merge,
        # bit-identical to the 1D data mesh (same slot-shard count).
        from c99_vectordb_tpu.parallel import (
            ShardedIVFIndex, make_host_chip_mesh,
        )

        vectors, ids, queries = corpus
        flat_mesh = make_mesh(n_data=8)
        one = ShardedIVFIndex(dim=64, nlist=16, nprobe=4, mesh=flat_mesh)
        one.load(vectors, ids)
        want_d, want_i = one.search(queries, 10, nprobe=4)

        hmesh = make_host_chip_mesh(2, 4)
        two = ShardedIVFIndex(dim=64, nlist=16, nprobe=4, mesh=hmesh)
        two.load(vectors, ids)
        got_d, got_i = two.search(queries, 10, nprobe=4)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)
        assert two.scan_rows_per_chip(b=6)["shards"] == 8

    def test_ivf_two_level_int8_matches_1d(self, corpus):
        """Round 5 (VERDICT r4 weak #2): the SQ8 composite runs on
        ('host', 'chip') meshes — same per-shard kernels, hierarchical
        merge — bit-identical to the 1D data mesh."""
        from c99_vectordb_tpu.parallel import (
            ShardedIVFIndex, make_host_chip_mesh,
        )

        vectors, ids, queries = corpus
        one = ShardedIVFIndex(
            dim=64, nlist=16, nprobe=16, scan_dtype="int8",
            mesh=make_mesh(n_data=8),
        )
        one.load(vectors, ids)
        want_d, want_i = one.search(queries, 5, nprobe=16)
        two = ShardedIVFIndex(
            dim=64, nlist=16, nprobe=16, scan_dtype="int8",
            mesh=make_host_chip_mesh(2, 4),
        )
        two.load(vectors, ids)
        got_d, got_i = two.search(queries, 5, nprobe=16)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)

    def test_flat_two_level_matches_1d(self, corpus):
        """ShardedFlatIndex on a ('host', 'chip') mesh (previously a
        hard raise) matches the 1D data mesh bit-for-bit."""
        from c99_vectordb_tpu.parallel import (
            ShardedFlatIndex, make_host_chip_mesh,
        )

        vectors, ids, queries = corpus
        one = ShardedFlatIndex(dim=64, mesh=make_mesh(n_data=8))
        one.add(vectors, ids)
        want_d, want_i = one.search(queries, 5)
        two = ShardedFlatIndex(dim=64, mesh=make_host_chip_mesh(2, 4))
        two.add(vectors, ids)
        got_d, got_i = two.search(queries, 5)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)


class TestSlotShardLayout:
    """Property tests for _slot_shard_layout: balance, capacity, and the
    ascending-id-per-chip invariant the Pallas tie-break relies on."""

    @pytest.mark.parametrize("shards", [1, 2, 3, 8])
    def test_invariants(self, shards):
        from c99_vectordb_tpu.parallel.sharded import _slot_shard_layout

        rng = np.random.default_rng(shards)
        nlist = 7
        assign = rng.integers(0, nlist, 500).astype(np.int64)
        pad_local, order, sorted_lists, slots = _slot_shard_layout(
            assign, nlist, shards
        )
        pad = pad_local * shards
        # capacity: every row got a unique (list, slot) cell in range
        assert (slots >= 0).all() and (slots < pad).all()
        cells = set(zip(sorted_lists.tolist(), slots.tolist()))
        assert len(cells) == len(assign)
        # balance: per (list, chip) occupancy differs by <= 1 within a list
        chip = slots // pad_local
        for lst in range(nlist):
            m = sorted_lists == lst
            if not m.any():
                continue
            counts = np.bincount(chip[m], minlength=shards)
            assert counts.max() - counts.min() <= 1
        # ascending ids inside each chip's sub-list: rows are placed in
        # id order (order is the id-stable sort), so within (list, chip)
        # the local slot must increase with placement order
        local = slots % pad_local
        for lst in range(nlist):
            for c in range(shards):
                m = (sorted_lists == lst) & (chip == c)
                if m.sum() > 1:
                    assert (np.diff(local[m]) > 0).all()


class TestShardedIVFPQRound4:
    """VERDICT r3 weak #2: sharded PQ perf-grade — OPQ, ksub=16, and the
    ("host", "chip") two-level route (CPU mesh exercises the XLA route;
    the per-shard Pallas kernel route is compile-gated on the real chip
    by benchmarks/compile_check.py)."""

    def test_opq_matches_single_chip(self, corpus):
        from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex
        from c99_vectordb_tpu.parallel.mesh import make_mesh

        vectors, ids, queries = corpus
        single = IVFPQIndex(
            dim=64, nlist=16, nprobe=16, m=8, refine=True, opq=True, opq_iters=2
        )
        single.train(vectors)
        single.add(vectors, ids)
        want_d, want_i = single.search(queries, 5, nprobe=16)

        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(
            dim=64, nlist=16, nprobe=16, m=8, opq=True, opq_iters=2, mesh=mesh
        )
        pq.load(vectors, ids)
        got_d, got_i = pq.search(queries, 5, nprobe=16)
        # Same rotation/quantizer training (same seeds) + exact refine.
        true_got = ((queries[:, None, :] - vectors[got_i]) ** 2).sum(-1)
        np.testing.assert_allclose(got_d, true_got, rtol=1e-4, atol=1e-4)
        overlap = sum(
            len(set(got_i[q].tolist()) & set(want_i[q].tolist()))
            for q in range(len(queries))
        ) / want_i.size
        assert overlap >= 0.8

    def test_ksub16_exact_distances(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex
        from c99_vectordb_tpu.parallel.mesh import make_mesh

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(
            dim=64, nlist=16, nprobe=16, m=8, ksub=16, refine_factor=8,
            mesh=mesh,
        )
        pq.load(vectors, ids)
        d, i = pq.search(queries, 5, nprobe=16)
        assert (i >= 0).all()
        true_d = ((queries[:, None, :] - vectors[i]) ** 2).sum(-1)
        np.testing.assert_allclose(d, true_d, rtol=1e-4, atol=1e-4)

    def test_two_level_mesh_matches_1d(self, corpus):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex
        from c99_vectordb_tpu.parallel.mesh import make_host_chip_mesh, make_mesh

        vectors, ids, queries = corpus
        flat_mesh = make_mesh(n_data=8)
        one = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, mesh=flat_mesh)
        one.load(vectors, ids)
        want_d, want_i = one.search(queries, 5, nprobe=16)

        mesh2 = make_host_chip_mesh(2, 4)
        two = ShardedIVFPQIndex(dim=64, nlist=16, nprobe=16, m=8, mesh=mesh2)
        two.load(vectors, ids)
        got_d, got_i = two.search(queries, 5, nprobe=16)
        # Identical training + identical slot layout (8 shards either
        # way) + exact refine and lexicographic merges: bit-identical.
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)

    def test_opq_state_roundtrip(self, corpus, tmp_path):
        from c99_vectordb_tpu.parallel import ShardedIVFPQIndex
        from c99_vectordb_tpu.parallel.mesh import make_mesh
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        pq = ShardedIVFPQIndex(
            dim=64, nlist=16, nprobe=16, m=8, opq=True, opq_iters=2, mesh=mesh
        )
        pq.load(vectors, ids)
        want_d, want_i = pq.search(queries, 5)
        path = tmp_path / "sharded_pq_opq.memo"
        write_index(pq, path)
        loaded = read_index(path)
        got_d, got_i = loaded.search(queries, 5)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)


class TestShardedRound5:
    """Round-5 feature parity with the single-chip families (VERDICT r4
    next #1/#2): GrowTail O(batch) incremental add, id_mask pushdown,
    in-place removal, and device-resident build — on every sharded
    family, checked against the brute-force oracle."""

    @staticmethod
    def _oracle(db, dbids, q, k, mask=None):
        d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
        if mask is not None:
            d = np.where(mask[dbids][None, :], d, np.inf)
        out_d = np.sort(d, axis=1)[:, :k]
        order = np.lexsort(
            (np.broadcast_to(dbids, d.shape), d), axis=1
        )[:, :k]
        out_i = np.where(np.isinf(out_d), -1, dbids[order])
        return out_d, out_i

    @pytest.fixture(scope="class")
    def mask(self, corpus):
        _, ids, _ = corpus
        m = np.zeros(ids.shape[0], bool)
        m[::3] = True
        return m

    def _families(self, mesh):
        from c99_vectordb_tpu.parallel import (
            ShardedIVFIndex, ShardedIVFPQIndex,
        )

        return [
            ("flat", ShardedFlatIndex(dim=64, mesh=mesh), True),
            ("flat_sq8", ShardedFlatIndex(
                dim=64, scan_dtype="int8", mesh=mesh), True),
            ("ivf", ShardedIVFIndex(
                dim=64, nlist=16, nprobe=16, mesh=mesh), True),
            ("ivf_sq8", ShardedIVFIndex(
                dim=64, nlist=16, nprobe=16, scan_dtype="int8",
                mesh=mesh), True),
            ("pq", ShardedIVFPQIndex(
                dim=64, nlist=8, nprobe=8, m=8, refine_factor=16,
                mesh=mesh), False),
        ]

    @pytest.mark.parametrize("two_level", [False, True])
    def test_incremental_add_and_mask_and_remove(self, corpus, mask,
                                                 two_level):
        from c99_vectordb_tpu.parallel.mesh import make_host_chip_mesh

        vectors, ids, queries = corpus
        mesh = make_host_chip_mesh(2, 4) if two_level else make_mesh(n_data=8)
        k = 5
        for name, ix, exact in self._families(mesh):
            if hasattr(ix, "load"):
                ix.load(vectors[:800], ids[:800])
            else:
                ix.add(vectors[:800], ids[:800])
            ix.search(queries, k)  # stage
            # O(batch) add: staging survives, rows park in the tail
            ix.add(vectors[800:], ids[800:])
            assert ix._staged is not None and ix._tail is not None, name
            assert ix._tail.count == 200, name
            d, i = ix.search(queries, k)
            od, oi = self._oracle(vectors, ids, queries, k)
            if exact:
                np.testing.assert_array_equal(i, oi, err_msg=name)
            else:
                got = np.asarray(i)
                rec = np.mean([
                    len(set(a) & set(b)) / k for a, b in zip(got, oi)
                ])
                assert rec >= 0.8, (name, rec)
            # masked search: no unmasked id may appear
            d, i = ix.search(queries, k, id_mask=mask)
            got = np.asarray(i)
            legal = (got < 0) | mask[got.clip(0)]
            assert legal.all(), (name, "mask leak")
            if exact:
                od, oi = self._oracle(vectors, ids, queries, k, mask)
                np.testing.assert_array_equal(got, oi, err_msg=name)
            # in-place removal: staging survives
            staged_before = ix._staged
            removed = ix.remove_ids(ids[:10])
            assert removed == 10, name
            assert ix.ntotal == 990, name
            d, i = ix.search(queries, k)
            assert not np.isin(np.asarray(i), ids[:10]).any(), name
            if exact:
                keep = ids >= 10
                od, oi = self._oracle(
                    vectors[keep], ids[keep], queries, k
                )
                np.testing.assert_array_equal(np.asarray(i), oi,
                                               err_msg=name)

    def test_device_mode_end_to_end(self, corpus, mask):
        import jax.numpy as jnp

        from c99_vectordb_tpu.parallel import (
            ShardedIVFIndex, ShardedIVFPQIndex,
        )

        vectors, ids, queries = corpus
        dev = jnp.asarray(vectors)
        did = jnp.asarray(ids.astype(np.int32))
        mesh = make_mesh(n_data=8)
        k = 5
        families = [
            ("flat", ShardedFlatIndex(dim=64, mesh=mesh), True),
            ("ivf_sq8", ShardedIVFIndex(
                dim=64, nlist=16, nprobe=16, scan_dtype="int8",
                mesh=mesh), True),
            ("pq", ShardedIVFPQIndex(
                dim=64, nlist=8, nprobe=8, m=8, refine_factor=16,
                mesh=mesh), False),
        ]
        for name, ix, exact in families:
            ix.add(dev[:800], did[:800])
            assert ix._mode == "device", name
            ix.search(queries, k)
            ix.add(dev[800:], did[800:])
            assert ix._tail is not None and ix._tail.count == 200, name
            d, i = ix.search(queries, k)
            od, oi = self._oracle(vectors, ids, queries, k)
            if exact:
                np.testing.assert_array_equal(np.asarray(i), oi,
                                               err_msg=name)
            # masked + device mode together
            d, i = ix.search(queries, k, id_mask=mask)
            got = np.asarray(i)
            assert ((got < 0) | mask[got.clip(0)]).all(), name
            # reconstruct + in-place removal + state round-trip
            np.testing.assert_allclose(
                ix.reconstruct(42), vectors[42], atol=1e-2
            )
            assert ix.remove_ids([42]) == 1 and ix.ntotal == 999, name
            params, arrays = ix.state()
            assert arrays["vectors"].shape[0] == 999, name
            loaded = type(ix).from_state(params, arrays)
            d2, i2 = loaded.search(queries, k)
            got2, got = np.asarray(i2), np.asarray(ix.search(queries, k)[1])
            if exact:
                np.testing.assert_array_equal(got2, got, err_msg=name)

    def test_tail_then_restage_matches(self, corpus):
        """Forcing the restage (fold the tail into the lists) must not
        change exact-family results."""
        from c99_vectordb_tpu.parallel import ShardedIVFIndex

        vectors, ids, queries = corpus
        mesh = make_mesh(n_data=8)
        ix = ShardedIVFIndex(dim=64, nlist=16, nprobe=16, mesh=mesh)
        ix.load(vectors[:800], ids[:800])
        ix.search(queries, 5)
        ix.add(vectors[800:], ids[800:])
        d_tail, i_tail = ix.search(queries, 5)
        ix._restage_needed = True
        d_fold, i_fold = ix.search(queries, 5)
        assert ix._tail is None
        np.testing.assert_array_equal(i_fold, i_tail)
        np.testing.assert_allclose(d_fold, d_tail, rtol=1e-5, atol=1e-6)

    def test_mask_cache_reuse(self, corpus, mask):
        """Passing the same mask object must reuse the staged masked
        operands (one build per mask object)."""
        vectors, ids, queries = corpus
        ix = ShardedFlatIndex(dim=64, mesh=make_mesh(n_data=8))
        ix.add(vectors, ids)
        ix.search(queries, 5, id_mask=mask)
        built = ix._mask_cache._value
        ix.search(queries, 5, id_mask=mask)
        assert ix._mask_cache._value is built
