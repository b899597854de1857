"""remove_ids on every family (the FAISS IndexIDMap2.remove_ids analog):
host mode filters + restages; device mode removes IN PLACE (ids -> -1,
scan norms / item constants -> +inf) without a rebuild."""

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


def _oracle(points, ids, q, k):
    d = ((q[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, order, axis=1), ids[order]


POINTS = _corpus(400, 24, seed=1)
IDS = np.arange(400, dtype=np.int64)
Q = _corpus(4, 24, seed=2)
DROP = np.arange(0, 400, 7, dtype=np.int64)           # 58 ids
KEEP = np.setdiff1d(IDS, DROP)


def _verify(idx, k=6):
    removed = idx.remove_ids(DROP)
    assert removed == len(DROP)
    assert idx.ntotal == len(KEEP)
    dd, di = idx.search(Q, k)
    od, oi = _oracle(POINTS[KEEP], KEEP, Q, k)
    np.testing.assert_array_equal(di, oi)
    np.testing.assert_allclose(dd, od, rtol=1e-4, atol=1e-5)
    # Absent ids are ignored; double removal is a no-op.
    assert idx.remove_ids(DROP) == 0


@pytest.mark.parametrize("scan_dtype", ["float32", "int8"])
def test_flat_remove(scan_dtype):
    idx = FlatIndex(dim=24, scan_dtype=scan_dtype)
    idx.add(POINTS, IDS)
    idx.search(Q, 3)
    _verify(idx)
    np.testing.assert_array_equal(np.sort(idx.ids()), KEEP)


@pytest.mark.parametrize("scan_dtype", ["float32", "int8"])
def test_ivf_flat_remove_host(scan_dtype):
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4, scan_dtype=scan_dtype)
    idx.train(POINTS)
    idx.add(POINTS, IDS)
    idx.search(Q, 3)
    _verify(idx)


@pytest.mark.parametrize("scan_dtype", ["float32", "int8"])
def test_ivf_flat_remove_device_in_place(scan_dtype):
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4, scan_dtype=scan_dtype)
    idx.train(jnp.asarray(POINTS))
    idx.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    idx.search(Q, 3)                              # stage
    pad_before = idx._staged[6]
    _verify(idx)
    assert idx._staged is not None and idx._staged[6] == pad_before  # no rebuild
    # ranked_all excludes removed rows too.
    dists, ids_r = idx.ranked_all(Q[0])
    assert dists.shape[0] == len(KEEP)
    assert not (set(DROP.tolist()) & set(ids_r.tolist()))


def test_ivf_flat_remove_device_folds_tail_first():
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
    idx.add(jnp.asarray(POINTS[:300]), jnp.asarray(np.arange(300, dtype=np.int32)))
    idx.search(Q, 3)
    idx.add(jnp.asarray(POINTS[300:]), jnp.asarray(np.arange(300, 400, dtype=np.int32)))
    assert idx._tail is not None
    _verify(idx)
    assert idx._tail is None                       # folded before removal


def test_ivf_pq_remove_host_and_device():
    host = IVFPQIndex(dim=24, nlist=4, nprobe=4, m=4, refine=True,
                      refine_factor=32)
    host.train(POINTS)
    host.add(POINTS, IDS)
    host.search(Q, 3)
    _verify(host)

    dev = IVFPQIndex(dim=24, nlist=4, nprobe=4, m=4, refine=True,
                     refine_factor=32)
    dev.train(jnp.asarray(POINTS))
    dev.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    dev.search(Q, 3)
    _verify(dev)
    dists, ids_r = dev.ranked_all(Q[0])
    assert dists.shape[0] == len(KEEP)
    assert not (set(DROP.tolist()) & set(ids_r.tolist()))


def test_sharded_remove():
    from c99_vectordb_tpu.parallel import ShardedIVFIndex
    from c99_vectordb_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    idx = ShardedIVFIndex(dim=24, nlist=4, nprobe=4, mesh=mesh)
    idx.load(POINTS, IDS)
    idx.search(Q, 3)
    _verify(idx)


def test_remove_then_serialize_roundtrip_device_mode(tmp_path):
    from c99_vectordb_tpu.storage.index_io import read_index, write_index

    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
    idx.train(jnp.asarray(POINTS))
    idx.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    idx.search(Q, 3)
    idx.remove_ids(DROP)
    path = tmp_path / "removed.memo"
    write_index(idx, path)
    back = read_index(path)
    assert back.ntotal == len(KEEP)
    bd, bi = back.search(Q, 5)
    dd, di = idx.search(Q, 5)
    np.testing.assert_array_equal(bi, di)
    np.testing.assert_allclose(bd, dd, rtol=1e-5, atol=1e-6)


def test_remove_then_mask_interaction():
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
    idx.train(jnp.asarray(POINTS))
    idx.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    idx.search(Q, 3)
    idx.remove_ids(DROP)
    mask = np.zeros(400, bool)
    mask[KEEP[::2]] = True
    mask[DROP] = True  # masking-in a REMOVED id must not resurrect it
    dd, di = idx.search(Q, 5, id_mask=mask)
    live = KEEP[::2]
    od, oi = _oracle(POINTS[live], live, Q, 5)
    np.testing.assert_array_equal(di, oi)


def test_memodb_delete_fast_path(tmp_path):
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([
        {"body": f"note {i}", "metadata": {"i": i}} for i in range(10)
    ])
    assert db.delete(3) is True
    assert db.delete(3) is False          # already blank
    assert db.delete(99) is False         # absent
    hits = db.recall("note 3", k=10)
    assert all(h.doc_id != 3 for h in hits)
    assert len(db) == 9
    # Tombstone compacts away on reindex (reference lifecycle).
    assert db.reindex() == 1


class TestReconstruct:
    """reconstruct(id) — the other half of the IndexIDMap2 analog."""

    def test_flat_and_ivf_flat(self):
        for idx in (FlatIndex(dim=24), IVFFlatIndex(dim=24, nlist=4)):
            if hasattr(idx, "train"):
                idx.train(POINTS)
            idx.add(POINTS, IDS)
            np.testing.assert_allclose(idx.reconstruct(123), POINTS[123])
            with pytest.raises(KeyError):
                idx.reconstruct(4000)

    def test_ivf_flat_device_mode(self):
        idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
        idx.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
        idx.search(Q, 3)                       # stage (frees chunks)
        np.testing.assert_allclose(
            idx.reconstruct(123), POINTS[123], rtol=1e-6
        )
        idx.remove_ids(np.asarray([123]))
        with pytest.raises(KeyError):
            idx.reconstruct(123)

    def test_ivf_pq_refine_exact_and_pure_code_approx(self):
        exact = IVFPQIndex(dim=24, nlist=4, m=4, refine=True)
        exact.train(POINTS)
        exact.add(POINTS, IDS)
        np.testing.assert_allclose(exact.reconstruct(77), POINTS[77])

        code = IVFPQIndex(dim=24, nlist=4, m=4, refine=False)
        code.train(POINTS)
        code.add(POINTS, IDS)
        approx = code.reconstruct(77)
        # PQ reconstruction: closer to the row than to random others.
        err = np.linalg.norm(approx - POINTS[77])
        other = np.linalg.norm(approx - POINTS[78])
        assert err < other

        # Device mode, pure-code: same reconstruction (same quantizer).
        dev = IVFPQIndex(dim=24, nlist=4, m=4, refine=False)
        dev.train(jnp.asarray(POINTS))
        dev.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
        dev.search(Q, 3)
        np.testing.assert_allclose(dev.reconstruct(77), approx, rtol=1e-5,
                                   atol=1e-6)

    def test_sharded(self):
        from c99_vectordb_tpu.parallel import ShardedFlatIndex
        from c99_vectordb_tpu.parallel.mesh import make_mesh

        idx = ShardedFlatIndex(dim=24, mesh=make_mesh(n_data=8))
        idx.load(POINTS, IDS)
        np.testing.assert_allclose(idx.reconstruct(9), POINTS[9])


def test_remove_pow2_boundary_id_device_mode():
    # Review r4 #2: the removal table is sized by the MAX REMOVED id;
    # live ids beyond it must never clip-alias onto its boundary slot.
    # remove_ids([255]) destroyed ids 256..399 before the fix.
    idx = IVFFlatIndex(dim=24, nlist=4, nprobe=4)
    idx.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    idx.search(Q, 3)
    assert idx.remove_ids(np.asarray([255])) == 1
    assert idx.ntotal == 399
    kept = np.setdiff1d(IDS, [255])
    dd, di = idx.search(Q, 6)
    od, oi = _oracle(POINTS[kept], kept, Q, 6)
    np.testing.assert_array_equal(di, oi)

    pq = IVFPQIndex(dim=24, nlist=4, nprobe=4, m=4, refine=True,
                    refine_factor=32)
    pq.train(jnp.asarray(POINTS))
    pq.add(jnp.asarray(POINTS), jnp.asarray(IDS.astype(np.int32)))
    pq.search(Q, 3)
    assert pq.remove_ids(np.asarray([15])) == 1
    assert pq.ntotal == 399


def test_mask_beyond_cap_excludes():
    # A mask shorter than the id space must EXCLUDE ids past its cap,
    # not clip them onto the boundary slot.
    idx = FlatIndex(dim=24)
    idx.add(POINTS, IDS)
    mask = np.ones(256, bool)       # covers ids 0..255 only
    dd, di = idx.search(Q, 400)
    live = di[di >= 0]
    dm, im = idx.search(Q, 6, id_mask=mask)
    assert (im[im >= 0] < 256).all()


def test_memodb_delete_marks_deleted(tmp_path):
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([{"body": f"note {i}", "metadata": {"i": i}} for i in range(4)])
    db.delete(2)
    hits = list(db.analyze({"i": 2}))
    assert hits and hits[0][1].get("deleted") is True
