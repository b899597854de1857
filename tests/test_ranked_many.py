"""ranked_many_device: the batched full-ranking program behind `memo
serve --batch` — every row of the batched output must match the
single-query ranked_all_device for that query exactly (same scoring
formulation per query via lax.map; ops/distances.ranked_many_program)."""

import numpy as np
import pytest

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    points = rng.standard_normal((512, 32)).astype(np.float32)
    ids = np.arange(512, dtype=np.int64)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    return points, ids, queries


def _build(kind, points, ids):
    if kind == "flat":
        index = FlatIndex(dim=32)
    elif kind == "ivf_flat":
        index = IVFFlatIndex(dim=32, nlist=8)
        index.train(points)
    else:
        index = IVFPQIndex(dim=32, nlist=8, m=4)
        index.train(points)
    index.add(points, ids)
    return index


@pytest.mark.parametrize("kind", ["flat", "ivf_flat", "ivf_pq"])
def test_rows_match_single_query_ranking(kind, data):
    points, ids, queries = data
    index = _build(kind, points, ids)
    d_all, i_all, n = index.ranked_many_device(queries)
    assert n == index.ntotal
    for qi in range(queries.shape[0]):
        d1, i1, n1 = index.ranked_all_device(queries[qi])
        assert n1 == n
        np.testing.assert_array_equal(
            np.asarray(i_all[qi])[:n], np.asarray(i1)[:n]
        )
        np.testing.assert_array_equal(
            np.asarray(d_all[qi])[:n], np.asarray(d1)[:n]
        )


def test_pure_code_pq_returns_none(data):
    points, ids, queries = data
    index = IVFPQIndex(dim=32, nlist=8, m=4, refine=False)
    index.train(points)
    index.add(points, ids)
    assert index.ranked_many_device(queries) is None  # callers fall back


def test_batch_of_one_matches(data):
    points, ids, queries = data
    index = _build("flat", points, ids)
    d_all, i_all, n = index.ranked_many_device(queries[:1])
    d1, i1, _ = index.ranked_all_device(queries[0])
    np.testing.assert_array_equal(np.asarray(i_all[0]), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d_all[0]), np.asarray(d1))
