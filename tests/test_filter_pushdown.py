"""Filtered-search pushdown (VERDICT r3 next #8): index families accept
an external-id bitmask intersected inside the device scan; results must
match the post-filter oracle. CPU backend exercises the XLA routes; the
kernel routes share the same +inf-norms exclusion operand and are
checked on the real chip by benchmarks/exp_filtered.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex


def _corpus(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _masked_oracle(points, ids, mask, q, k):
    keep = mask[ids]
    d = ((q[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    d = np.where(keep[None, :], d, np.inf)
    order = np.argsort(d, axis=1)[:, :k]
    out_d = np.take_along_axis(d, order, axis=1)
    out_i = np.where(np.isinf(out_d), -1, ids[order])
    return out_d, out_i


@pytest.fixture(scope="module")
def data():
    points = _corpus(400, 24, seed=1)
    ids = np.arange(400, dtype=np.int64)
    rng = np.random.default_rng(2)
    mask = rng.random(400) < 0.1  # ~10% selectivity
    q = _corpus(5, 24, seed=3)
    return points, ids, mask, q


def _check(idx, data, k=7, **search_kw):
    points, ids, mask, q = data
    dd, di = idx.search(q, k, id_mask=mask, **search_kw)
    od, oi = _masked_oracle(points, ids, mask, q, k)
    np.testing.assert_array_equal(di, oi)
    finite = ~np.isinf(od)
    np.testing.assert_allclose(dd[finite], od[finite], rtol=1e-4, atol=1e-5)
    # Unmasked search still works afterwards (mask staging is a COPY).
    du, iu = idx.search(q, k, **search_kw)
    assert not np.array_equal(iu, di)


@pytest.mark.parametrize("scan_dtype", ["float32", "int8"])
def test_flat_mask_matches_oracle(data, scan_dtype):
    points, ids, mask, q = data
    idx = FlatIndex(dim=24, scan_dtype=scan_dtype)
    idx.add(points, ids)
    _check(idx, data)


@pytest.mark.parametrize("scan_dtype", ["float32", "int8"])
def test_ivf_flat_mask_matches_oracle(data, scan_dtype):
    points, ids, mask, q = data
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4, scan_dtype=scan_dtype)
    idx.train(points)
    idx.add(points, ids)
    _check(idx, data)


def test_ivf_pq_mask_matches_oracle(data):
    points, ids, mask, q = data
    idx = IVFPQIndex(dim=24, nlist=4, nprobe=4, m=4, refine=True,
                     refine_factor=16)
    idx.train(points)
    idx.add(points, ids)
    # PQ shortlists are approximate; with nprobe=nlist and a deep
    # refine shortlist the masked top-k must match the oracle.
    _check(idx, data)


def test_mask_covers_incremental_tail(data):
    points, ids, mask, q = data
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
    idx.train(points[:300])
    idx.add(points[:300], ids[:300])
    idx.search(q, k=3)                       # stage
    idx.add(points[300:], ids[300:])         # tail rows
    assert idx._tail is not None and idx._tail.count == 100
    _check(idx, data)


def test_mask_is_per_call_not_sticky(data):
    points, ids, mask, q = data
    idx = FlatIndex(dim=24)
    idx.add(points, ids)
    d0, i0 = idx.search(q, 5)
    _ = idx.search(q, 5, id_mask=mask)
    d1, i1 = idx.search(q, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1)


def test_memodb_pushdown_matches_postfilter(tmp_path):
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    rng = np.random.default_rng(5)
    recs = [
        {"body": f"note number {i} about {'tea' if i % 3 else 'coffee'}",
         "metadata": {"source": "user" if i % 2 else "agent", "i": i}}
        for i in range(40)
    ]
    db.save_many(recs)
    post = db.recall("note about tea", k=5, filter="{source: user}")
    push = db.recall("note about tea", k=5, filter="{source: user}",
                     pushdown=True)
    assert [h.doc_id for h in push] == [h.doc_id for h in post]
    np.testing.assert_allclose(
        [h.score for h in push], [h.score for h in post], rtol=1e-5
    )


def test_mask_shortlist_ids_scrubs_masked_entries():
    from c99_vectordb_tpu.models.devbuild import mask_shortlist_ids

    mask = np.zeros(10, bool)
    mask[[2, 5]] = True
    ids = jnp.asarray([[2, 3, 5, -1, 9], [0, 5, 2, 2, -1]], jnp.int32)
    out = np.asarray(mask_shortlist_ids(ids, jnp.asarray(mask)))
    np.testing.assert_array_equal(
        out, [[2, -1, 5, -1, -1], [-1, 5, 2, 2, -1]]
    )
