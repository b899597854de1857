"""Pallas IVF list-scan kernel vs the XLA probe-gather path and brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_full_search_program


@pytest.fixture(scope="module")
def staged_ivf():
    rng = np.random.default_rng(17)
    centers = rng.standard_normal((16, 64)).astype(np.float32) * 6.0
    points = np.concatenate(
        [c + rng.standard_normal((128, 64)).astype(np.float32) for c in centers]
    )
    ids = np.arange(points.shape[0], dtype=np.int64)
    ivf = IVFFlatIndex(dim=64, nlist=16, nprobe=16)
    ivf.train(points)
    ivf.add(points, ids)
    centroids, c_sq, list_vecs, list_ids, list_sqn, _, pad = ivf._stage()
    return points, ids, (centroids, c_sq, list_vecs, list_sqn, list_ids, pad), ivf


class TestPallasIVFScan:
    def test_full_probe_matches_exact(self, staged_ivf):
        points, ids, staged, _ = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        rng = np.random.default_rng(3)
        queries = (points[rng.choice(len(points), 8)] + 0.05).astype(np.float32)

        program = ivf_full_search_program(16, pad, 64, 8, 16, 10)
        d, i = program(centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(queries))
        d, i = np.asarray(d), np.asarray(i)

        flat = FlatIndex(dim=64)
        flat.add(points, ids)
        want_d, _ = flat.search(queries, 10)
        true_got = ((queries[:, None, :] - points[i]) ** 2).sum(-1)
        # 5e-3 atol: want_d comes from the f32 matmul expansion, true_got
        # from exact numpy — both correct, differing by f32 cancellation
        np.testing.assert_allclose(true_got, want_d, rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(d, want_d, rtol=1e-3, atol=5e-3)

    def test_matches_xla_ivf_path(self, staged_ivf):
        points, ids, staged, ivf = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        rng = np.random.default_rng(4)
        queries = rng.standard_normal((4, 64)).astype(np.float32) * 4.0

        program = ivf_full_search_program(16, pad, 64, 4, 4, 5)
        d_p, i_p = program(centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(queries))
        d_x, i_x = ivf.search(queries, 5, nprobe=4)
        np.testing.assert_array_equal(np.asarray(i_p), i_x)
        np.testing.assert_allclose(np.asarray(d_p), d_x, rtol=1e-3, atol=1e-3)

    def test_k_exceeding_list_content(self, staged_ivf):
        points, ids, staged, _ = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        q = points[:2].astype(np.float32)
        program = ivf_full_search_program(16, pad, 64, 2, 1, 100)
        d, i = program(centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(q))
        d, i = np.asarray(d), np.asarray(i)
        # one probed list holds ~128 points; k=100 must fill from it only
        assert (i[0] >= -1).all()
        valid = i[0] >= 0
        assert valid.sum() >= 50
        assert (np.diff(d[0][valid]) >= -1e-5).all()
