"""Round-3 regression tests: VERDICT/ADVICE round-2 closures.

Covers the dense-scan (B, k) shape contract (ADVICE #1), the
rerank_dtype combination guard (ADVICE #2), ranked_all staging caches
(VERDICT weak #3), the bounded pure-ADC ranked_all (weak #7), the
corpus-size-aware nlist default (weak #6), the FAISS-file migration
hint (missing #1), and save_many validation (next-round #9).
"""

import numpy as np
import pytest

from c99_vectordb_tpu.models.flat import FlatIndex
from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex


@pytest.fixture(scope="module")
def tiny_corpus():
    rng = np.random.default_rng(11)
    points = rng.standard_normal((40, 32)).astype(np.float32)
    ids = np.arange(40, dtype=np.int64)
    return points, ids


class TestDenseScanShapeContract:
    """ADVICE round 2, #1: dense scan variants must return (B, k) padded
    with (inf, -1), never a silently clamped (B, nprobe*pad)."""

    def _tiny_lists(self):
        # 2 lists, pad 8, dim 128 (lane-aligned), 3 queries, nprobe 1
        rng = np.random.default_rng(5)
        nlist, pad, dim, b = 2, 8, 128, 3
        vecs = rng.standard_normal((nlist, pad, dim)).astype(np.float32)
        ids = np.arange(nlist * pad, dtype=np.int32).reshape(nlist, pad)
        ids[:, -2:] = -1  # padding slots
        sqn = np.einsum("lpd,lpd->lp", vecs, vecs).astype(np.float32)
        q = rng.standard_normal((b, dim)).astype(np.float32)
        lists = np.zeros((b, 1), np.int32)
        return nlist, pad, dim, b, vecs, ids, sqn, q, lists

    def test_dense_f32_pads_to_k(self):
        from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_scan_program_dense

        nlist, pad, dim, b, vecs, ids, sqn, q, lists = self._tiny_lists()
        k = 20  # > nprobe * pad = 8
        prog = ivf_scan_program_dense(nlist, pad, dim, b, 1, k)
        d, i = prog(lists, q, vecs, sqn, ids)
        assert d.shape == (b, k) and i.shape == (b, k)
        d, i = np.asarray(d), np.asarray(i)
        # 6 live slots per probed list -> 14 padded tail entries
        assert np.isinf(d[:, 6:]).all()
        assert (i[:, 6:] == -1).all()
        assert (np.diff(d[:, :6], axis=1) >= 0).all()

    def test_dense_int8_pads_to_ks(self):
        from c99_vectordb_tpu.ops.ivf_scan_pallas import (
            ivf_scan_program_dense_int8,
        )

        nlist, pad, dim, b, vecs, ids, sqn, q, lists = self._tiny_lists()
        codes = np.clip(np.rint(vecs * 10), -127, 127).astype(np.int8)
        qi = np.clip(np.rint(q * 10), -127, 127).astype(np.int8)
        qs = np.full((b, 1), 0.01, np.float32)
        ks = 20  # > nprobe * pad
        prog = ivf_scan_program_dense_int8(nlist, pad, dim, b, 1, ks)
        d, i, rows = prog(lists, qi, qs, codes, sqn, ids)
        assert d.shape == (b, ks) and i.shape == (b, ks)
        assert rows.shape == (b, ks)
        assert np.isinf(np.asarray(d)[:, 6:]).all()
        assert (np.asarray(i)[:, 6:] == -1).all()


class TestRerankDtypeGuard:
    def test_f32_scan_rejects_bf16_rerank(self):
        with pytest.raises(ValueError, match="quantized scan_dtype"):
            IVFFlatIndex(dim=32, scan_dtype="float32", rerank_dtype="bfloat16")

    def test_quantized_scans_accept_bf16_rerank(self):
        IVFFlatIndex(dim=32, scan_dtype="int8", rerank_dtype="bfloat16")
        IVFFlatIndex(dim=32, scan_dtype="bfloat16", rerank_dtype="bfloat16")


class TestRankedAllStagingCache:
    """VERDICT round 2, weak #3: the second ranked_all call must reuse
    device staging instead of re-transferring the corpus."""

    def test_ivf_flat_cache_reused_and_invalidated(self, tiny_corpus):
        points, ids = tiny_corpus
        ivf = IVFFlatIndex(dim=32, nlist=4, nprobe=4)
        ivf.add(points, ids)
        d1, i1 = ivf.ranked_all(points[3])
        cache = ivf._ranked_cache
        assert cache is not None
        d2, i2 = ivf.ranked_all(points[3])
        assert ivf._ranked_cache is cache  # no restage
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2)
        assert i1[0] == 3 and d1[0] < 1e-5
        ivf.add(points[:1] + 5.0, np.asarray([100], np.int64))
        assert ivf._ranked_cache is None  # invalidated on add

    def test_ivf_flat_reuses_f32_bucket_store(self, tiny_corpus):
        points, ids = tiny_corpus
        ivf = IVFFlatIndex(dim=32, nlist=4, nprobe=4)
        ivf.add(points, ids)
        ivf.search(points[:2], 5)  # builds the bucketed store
        ivf.ranked_all(points[0])
        # cache views the bucketed store: nlist*pad rows, not pow2(n)
        staged_store = ivf._staged[2]
        assert ivf._ranked_cache[0].shape[0] == (
            staged_store.shape[0] * staged_store.shape[1]
        )

    def test_sharded_cache_reused(self, tiny_corpus):
        from c99_vectordb_tpu.parallel.sharded import ShardedFlatIndex

        points, ids = tiny_corpus
        idx = ShardedFlatIndex(dim=32)
        idx.add(points, ids)
        d1, i1 = idx.ranked_all(points[2])
        cache = idx._ranked_cache
        assert cache is not None
        idx.ranked_all(points[2])
        assert idx._ranked_cache is cache
        assert i1[0] == 2
        idx.add(points[:1] + 3.0, np.asarray([200], np.int64))
        assert idx._ranked_cache is None


class TestPureAdcRankedAll:
    """VERDICT round 2, weak #7: refine=False ranked_all must be bounded
    (chunked dense ADC + sort), not a k=ntotal in-kernel shortlist."""

    def test_matches_full_probe_adc_search(self, tiny_corpus):
        points, ids = tiny_corpus
        pq = IVFPQIndex(dim=32, nlist=4, nprobe=4, m=4, refine=False)
        pq.train(points)
        pq.add(points, ids)
        dists, got = pq.ranked_all(points[7])
        assert len(got) == 40
        assert (np.diff(dists) >= -1e-5).all()
        # full-probe ADC search returns the same ranking
        sd, si = pq.search(points[7].reshape(1, -1), k=10, nprobe=4)
        np.testing.assert_array_equal(got[:10], si[0])
        np.testing.assert_allclose(dists[:10], sd[0], rtol=1e-5, atol=1e-5)


class TestAutoNlist:
    def test_scaling(self):
        from c99_vectordb_tpu.commands import auto_nlist

        assert auto_nlist(0) == 64
        assert auto_nlist(100) == 64          # floor
        assert auto_nlist(1_000_000) == 4096  # the measured 1M winner
        assert auto_nlist(100_000_000) == 8192  # cap
        assert auto_nlist(250_000) == 2048

    def test_make_index_uses_corpus_size(self, monkeypatch):
        from c99_vectordb_tpu.commands import make_index

        monkeypatch.setenv("C99VDB_INDEX", "ivf_flat")
        monkeypatch.delenv("C99VDB_NLIST", raising=False)
        idx = make_index(corpus_size=1_000_000)
        assert idx.nlist == 4096
        # explicit env pin wins over the heuristic
        monkeypatch.setenv("C99VDB_NLIST", "128")
        idx = make_index(corpus_size=1_000_000)
        assert idx.nlist == 128
        # unknown corpus keeps the old default
        monkeypatch.delenv("C99VDB_NLIST")
        idx = make_index()
        assert idx.nlist == 64


class TestFaissMigrationHint:
    def test_faiss_magic_hints_reindex(self, tmp_path, capsys):
        from c99_vectordb_tpu.storage.index_io import load_index_or_fresh

        p = tmp_path / "db.memo"
        p.write_bytes(b"IxM2" + b"\x00" * 64)  # IndexIDMap2 fourcc
        index = load_index_or_fresh(p, dim=8)
        assert index.ntotal == 0
        err = capsys.readouterr().err
        assert "FAISS-format index" in err and "reindex" in err

    def test_garbage_file_stays_silent(self, tmp_path, capsys):
        from c99_vectordb_tpu.storage.index_io import load_index_or_fresh

        p = tmp_path / "db.memo"
        p.write_bytes(b"corrupted!")
        index = load_index_or_fresh(p, dim=8)
        assert index.ntotal == 0
        assert capsys.readouterr().err == ""


class TestSaveManyValidation:
    def test_rejects_bad_records(self, tmp_path, monkeypatch):
        from c99_vectordb_tpu.api import MemoDB

        monkeypatch.delenv("C99VDB_INDEX", raising=False)
        db = MemoDB("db", cwd=str(tmp_path))
        with pytest.raises(ValueError, match="at least one record"):
            db.save_many([])
        with pytest.raises(ValueError, match="non-empty string"):
            db.save_many([{"body": "   "}])
        with pytest.raises(ValueError, match="non-empty string"):
            db.save_many([{"metadata": {"a": 1}}])
        with pytest.raises(ValueError, match="must be a mapping"):
            db.save_many([{"body": "ok", "metadata": "nope"}])
        with pytest.raises(ValueError, match="each record must be a mapping"):
            db.save_many(["just a string"])
        # nothing was persisted by the failed calls
        assert not (tmp_path / "db.yaml").exists()
        ids = db.save_many([{"body": "valid note"}])
        assert ids == [0]


class TestExactShortlistKnob:
    def test_env_forces_exact_selection(self, monkeypatch):
        from c99_vectordb_tpu.ops.ivf_scan_pallas import _use_approx_select

        monkeypatch.setenv("C99VDB_EXACT_SHORTLIST", "1")
        assert _use_approx_select() is False
        monkeypatch.delenv("C99VDB_EXACT_SHORTLIST")
        # CPU backend never uses approx regardless
        assert _use_approx_select() is False


class TestPQKsubKnob:
    def test_env_ksub_reaches_both_pq_families(self, monkeypatch):
        from c99_vectordb_tpu.commands import make_index

        monkeypatch.setenv("C99VDB_INDEX", "ivf_pq")
        monkeypatch.setenv("C99VDB_PQ_KSUB", "16")
        assert make_index().ksub == 16
        monkeypatch.setenv("C99VDB_INDEX", "sharded_ivf_pq")
        assert make_index().ksub == 16
        monkeypatch.delenv("C99VDB_PQ_KSUB")
        monkeypatch.setenv("C99VDB_INDEX", "ivf_pq")
        assert make_index().ksub == 256
