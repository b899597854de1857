"""OPQ rotation (models/ivf_pq.py): learned orthogonal pre-transform.

Reference parity note: FAISS exposes this as OPQMatrix; the reference CLI
never uses it (memo_cli.py holds a bare HNSW), so OPQ here is a quality
option for the corpus-scale engine, exercised via IVFPQIndex(opq=True).
"""

import numpy as np

from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex


def _correlated_corpus(n=4096, dim=32, seed=0):
    """Data whose variance is concentrated along directions that straddle
    subspace boundaries — the case plain PQ handles worst and OPQ fixes."""
    rng = np.random.default_rng(seed)
    low_rank = rng.standard_normal((n, 4)).astype(np.float32)
    mix = rng.standard_normal((4, dim)).astype(np.float32) * 3.0
    return low_rank @ mix + 0.1 * rng.standard_normal((n, dim)).astype(np.float32)


def _reconstruction_mse(index, data):
    """Quantization error through the index's own encode/decode."""
    data_q = index._rotate(data)
    assign, codes = index._encode(data)
    dsub = index.dim // index.m
    recon = np.concatenate(
        [index._codebooks[j][codes[:, j].astype(int)] for j in range(index.m)],
        axis=1,
    )
    recon = recon + index._centroids[assign]
    return float(((data_q - recon) ** 2).mean())


class TestOPQ:
    def test_rotation_is_orthogonal(self):
        data = _correlated_corpus()
        pq = IVFPQIndex(dim=32, nlist=4, m=4, opq=True, opq_iters=3, refine=False)
        pq.train(data)
        R = pq._rotation
        np.testing.assert_allclose(R @ R.T, np.eye(32), atol=1e-4)

    def test_opq_reduces_quantization_error(self):
        data = _correlated_corpus()
        plain = IVFPQIndex(dim=32, nlist=4, m=4, opq=False, refine=False)
        plain.train(data)
        opq = IVFPQIndex(dim=32, nlist=4, m=4, opq=True, opq_iters=6, refine=False)
        opq.train(data)
        mse_plain = _reconstruction_mse(plain, data)
        mse_opq = _reconstruction_mse(opq, data)
        assert mse_opq < 0.9 * mse_plain, (mse_opq, mse_plain)

    def test_search_scores_stay_in_original_space(self):
        # Rotation preserves L2: with refine on, returned distances must be
        # exact ORIGINAL-space squared L2 regardless of opq.
        data = _correlated_corpus(n=1024)
        ids = np.arange(1024, dtype=np.int64)
        pq = IVFPQIndex(dim=32, nlist=4, nprobe=4, m=4, opq=True, opq_iters=3)
        pq.train(data)
        pq.add(data, ids)
        q = data[:3] + 0.01
        d, i = pq.search(q, 5)
        true_d = ((q[:, None, :] - data[i]) ** 2).sum(-1)
        np.testing.assert_allclose(d, true_d, rtol=1e-4, atol=1e-4)

    def test_opq_recall_not_worse(self):
        from c99_vectordb_tpu.models.flat import FlatIndex

        data = _correlated_corpus(n=2048, seed=3)
        ids = np.arange(2048, dtype=np.int64)
        flat = FlatIndex(dim=32)
        flat.add(data, ids)
        q = _correlated_corpus(n=16, seed=9)
        _, want = flat.search(q, 10)

        def recall(opq):
            pq = IVFPQIndex(
                dim=32, nlist=4, nprobe=4, m=4, opq=opq, opq_iters=6, refine=False
            )
            pq.train(data)
            pq.add(data, ids)
            _, got = pq.search(q, 10)
            return sum(
                len(set(got[r].tolist()) & set(want[r].tolist())) for r in range(16)
            ) / want.size

        assert recall(True) >= recall(False) - 0.05

    def test_round_trip_preserves_rotation(self, tmp_path):
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        data = _correlated_corpus(n=512, seed=5)
        ids = np.arange(512, dtype=np.int64)
        pq = IVFPQIndex(dim=32, nlist=4, nprobe=4, m=4, opq=True, opq_iters=2)
        pq.train(data)
        pq.add(data, ids)
        want_d, want_i = pq.search(data[:4], 3)
        path = tmp_path / "opq.memo"
        write_index(pq, path)
        loaded = read_index(path)
        assert loaded.opq and loaded._rotation is not None
        np.testing.assert_allclose(loaded._rotation, pq._rotation)
        got_d, got_i = loaded.search(data[:4], 3)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)


def test_rotation_device_input_matches_numpy():
    # train_opq_rotation is device-resident; a device-array corpus (the
    # corpus-scale caller: a chunk that never left the TPU) must learn
    # the same rotation as the equivalent numpy input.
    import jax.numpy as jnp

    from c99_vectordb_tpu.models.ivf_pq import train_opq_rotation

    data = _correlated_corpus(n=2048, dim=32)
    r_np = train_opq_rotation(data, 4, iters=2, seed=1)
    r_dev = train_opq_rotation(jnp.asarray(data), 4, iters=2, seed=1)
    np.testing.assert_allclose(r_dev, r_np, rtol=1e-4, atol=1e-5)


def test_kmeans_multi_device_input_matches_numpy():
    import jax.numpy as jnp

    from c99_vectordb_tpu.ops.kmeans import train_kmeans_multi

    rng = np.random.default_rng(3)
    subs = rng.standard_normal((3, 600, 8)).astype(np.float32)
    host = train_kmeans_multi(subs, 16, iters=3, seed=2)
    dev = train_kmeans_multi(jnp.asarray(subs), 16, iters=3, seed=2)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)
