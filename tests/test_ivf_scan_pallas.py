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
    centroids, c_sq, list_vecs, list_ids, list_sqn, _, pad, _extra = ivf._stage()
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

    def test_cross_probe_tie_breaks_lowest_id(self):
        # Identical vectors land in DIFFERENT lists (each duplicated
        # cluster has its own centroid), so equal distances arrive from
        # different probes: the kernel's id-aware insertion must order
        # them lowest-id first, exactly like the XLA merge (ADVICE #2).
        rng = np.random.default_rng(5)
        base = rng.standard_normal((4, 32)).astype(np.float32) * 5.0
        # clusters 0/1 share one point value; clusters 2/3 another
        pts = []
        for c in range(4):
            blob = base[c] + rng.standard_normal((64, 32)).astype(np.float32)
            pts.append(blob)
        points = np.concatenate(pts)
        dup = rng.standard_normal((32,)).astype(np.float32)
        points[10] = dup + base[0] * 0  # keep absolute positions simple
        points[70] = points[10]         # same vector, different cluster
        ids = np.arange(points.shape[0], dtype=np.int64)
        ivf = IVFFlatIndex(dim=32, nlist=4, nprobe=4)
        ivf.train(np.concatenate([base[c] + np.zeros((1, 32), np.float32) for c in range(4)] + [points]))
        ivf.add(points, ids)
        centroids, c_sq, list_vecs, list_ids, list_sqn, _, pad, _x = ivf._stage()
        nlist_eff = centroids.shape[0]
        q = points[10:11]
        program = ivf_full_search_program(
            nlist_eff, pad, 32, 1, nlist_eff, 4, exact=True
        )
        d, i = program(
            centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(q)
        )
        d, i = np.asarray(d), np.asarray(i)
        assert i[0, 0] == 10 and i[0, 1] == 70  # tie -> lowest id first
        assert d[0, 0] == d[0, 1]

    def test_exact_scan_matches_oracle_ranking(self, staged_ivf):
        # exact=True (HIGHEST-precision in-kernel scoring) must reproduce
        # the f64 oracle's id ranking with full probing — no rerank stage.
        points, ids, staged, _ = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        rng = np.random.default_rng(6)
        queries = (points[rng.choice(len(points), 6)] + 0.03).astype(np.float32)
        program = ivf_full_search_program(16, pad, 64, 6, 16, 10, exact=True)
        d, i = program(
            centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(queries)
        )
        full = ((queries[:, None, :].astype(np.float64) - points[None]) ** 2).sum(-1)
        want = np.argsort(full, axis=1, kind="stable")[:, :10]
        np.testing.assert_array_equal(np.asarray(i), want)

    def test_multi_query_step_matches_single(self, staged_ivf):
        # The 4-queries-per-step kernel must be bit-identical to the
        # single-query kernel (same scoring, same tie rules).
        points, ids, staged, _ = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        rng = np.random.default_rng(11)
        queries = (points[rng.choice(len(points), 8)] + 0.02).astype(np.float32)
        for exact in (False, True):
            p1 = ivf_full_search_program(16, pad, 64, 8, 3, 10, exact=exact)
            p4 = ivf_full_search_program(
                16, pad, 64, 8, 3, 10, exact=exact, qps_step=4
            )
            d1, i1 = p1(centroids, c_sq, list_vecs, list_sqn, list_ids,
                        jnp.asarray(queries))
            d4, i4 = p4(centroids, c_sq, list_vecs, list_sqn, list_ids,
                        jnp.asarray(queries))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i4))
            np.testing.assert_array_equal(np.asarray(d1), np.asarray(d4))

    def test_dense_matches_single(self, staged_ivf):
        # Dense-output scan + XLA lex-sort must be bit-identical to the
        # in-kernel selection path (same scoring, same lowest-id ties).
        points, ids, staged, _ = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        rng = np.random.default_rng(12)
        queries = (points[rng.choice(len(points), 8)] + 0.02).astype(np.float32)
        for exact in (False, True):
            p1 = ivf_full_search_program(16, pad, 64, 8, 3, 10, exact=exact)
            pd = ivf_full_search_program(
                16, pad, 64, 8, 3, 10, exact=exact, dense=True
            )
            d1, i1 = p1(centroids, c_sq, list_vecs, list_sqn, list_ids,
                        jnp.asarray(queries))
            dd, di = pd(centroids, c_sq, list_vecs, list_sqn, list_ids,
                        jnp.asarray(queries))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(di))
            np.testing.assert_array_equal(np.asarray(d1), np.asarray(dd))

    def test_kth_boundary_tie_lowest_id_wins(self):
        # A duplicate vector (ids 70 then 10) split across two lists,
        # k=1: probe order fills the top-1 with id 70 first; when id 10
        # arrives with an EXACTLY equal distance it must replace it
        # (lowest-id rule holds at the k-th boundary too — a strict
        # dist<worst improving-count silently dropped it).
        D, pad = 32, 128
        rng = np.random.default_rng(8)
        dup = rng.standard_normal((D,)).astype(np.float32)
        lv = np.zeros((2, pad, D), np.float32)
        li = np.full((2, pad), -1, np.int32)
        lv[0, 0], li[0, 0] = dup, 70
        lv[1, 0], li[1, 0] = dup, 10
        ln = np.einsum("lpd,lpd->lp", lv, lv).astype(np.float32)
        cents = np.stack([dup + 0.01, dup + 0.5]).astype(np.float32)
        c_sq = np.einsum("nd,nd->n", cents, cents).astype(np.float32)
        q = dup[None, :]
        for dense in (False, True):
            prog = ivf_full_search_program(
                2, pad, D, 1, 2, 1, exact=True, dense=dense
            )
            _, i = prog(
                jnp.asarray(cents), jnp.asarray(c_sq), jnp.asarray(lv),
                jnp.asarray(ln), jnp.asarray(li), jnp.asarray(q),
            )
            assert int(np.asarray(i)[0, 0]) == 10, (dense, np.asarray(i))

    def test_underfilled_lists_keep_sentinels(self):
        # Fewer live rows than k: the selection kernel must leave (inf,
        # -1) padding, not re-insert duplicates of real ids (the first
        # boundary-tie fix counted (inf, -1) padding as improving while
        # the top-k was underfilled).
        D, pad, k = 32, 128, 10
        rng = np.random.default_rng(9)
        lv = np.zeros((2, pad, D), np.float32)
        li = np.full((2, pad), -1, np.int32)
        for s, rid in enumerate((100, 101, 102)):
            lv[0, s] = rng.standard_normal(D).astype(np.float32)
            li[0, s] = rid
        ln = np.einsum("lpd,lpd->lp", lv, lv).astype(np.float32)
        cents = np.stack([lv[0, 0] + 0.01, lv[0, 0] + 9.0]).astype(np.float32)
        c_sq = np.einsum("nd,nd->n", cents, cents).astype(np.float32)
        q2 = np.vstack([lv[0, 0][None, :]] * 2)  # b=2 -> qps_step=2 legal
        for dense, qps_step in ((False, 1), (False, 2), (True, 1)):
            prog = ivf_full_search_program(
                2, pad, D, 2, 1, k, exact=True, dense=dense,
                qps_step=qps_step,
            )
            _, i = prog(
                jnp.asarray(cents), jnp.asarray(c_sq), jnp.asarray(lv),
                jnp.asarray(ln), jnp.asarray(li), jnp.asarray(q2),
            )
            for row in np.asarray(i):
                assert sorted(row[:3].tolist()) == [100, 101, 102], (
                    dense, qps_step, row)
                assert (row[3:] == -1).all(), (dense, qps_step, row)

    def test_sq8_scan_plus_rerank_matches_exact(self, staged_ivf):
        # SQ8 dense scan shortlist + exact f32 rerank must reproduce the
        # exact path's results (the quantization noise stays inside the
        # shortlist slack on this well-separated fixture).
        from c99_vectordb_tpu.ops.ivf_scan_pallas import ivf_sq8_search_program
        from c99_vectordb_tpu.ops.rerank import build_id_lookup, exact_rerank_staged

        points, ids, staged, ivf = staged_ivf
        centroids, c_sq, list_vecs, list_sqn, list_ids, pad = staged
        lv = np.asarray(list_vecs)
        li = np.asarray(list_ids)
        live = li >= 0
        maxabs = np.abs(np.where(live[:, :, None], lv, 0.0)).max(
            axis=(0, 1), initial=1e-30
        )
        dim_scale = (maxabs / 127.0).astype(np.float32)
        codes = np.clip(np.rint(lv / dim_scale), -127, 127)
        dec_sqn = np.einsum("lpd,lpd->lp", codes * dim_scale, codes * dim_scale)

        rng = np.random.default_rng(13)
        queries = (points[rng.choice(len(points), 8)] + 0.03).astype(np.float32)
        ks = 20
        prog = ivf_sq8_search_program(16, pad, 64, 8, 3, ks)
        _, si, srows = prog(
            centroids, c_sq, jnp.asarray(codes.astype(np.int8)),
            jnp.asarray(dim_scale), jnp.asarray(dec_sqn.astype(np.float32)),
            list_ids, jnp.asarray(queries),
        )
        assert np.asarray(si).shape == (8, ks)
        # the scan's bucket-store rows must point at the candidate whose
        # id it reported (this is what lets the rerank skip the id->row
        # table gather)
        li_flat = li.reshape(-1)
        rows_np, si_np = np.asarray(srows), np.asarray(si)
        assert np.array_equal(
            li_flat[rows_np[si_np >= 0]], si_np[si_np >= 0]
        )
        # the single-query kernel must produce the identical shortlist
        # as the default 8-slot multi-query variant
        prog1 = ivf_sq8_search_program(16, pad, 64, 8, 3, ks, qps_step=1)
        _, si1, _ = prog1(
            centroids, c_sq, jnp.asarray(codes.astype(np.int8)),
            jnp.asarray(dim_scale), jnp.asarray(dec_sqn.astype(np.float32)),
            list_ids, jnp.asarray(queries),
        )
        np.testing.assert_array_equal(np.asarray(si), np.asarray(si1))
        # rows-mode rerank (the production route) — no id->row table
        from c99_vectordb_tpu.ops.rerank import exact_rerank_rows

        d_q, i_q = exact_rerank_rows(
            list_vecs.reshape(-1, 64), srows, si, jnp.asarray(queries), 10
        )
        # the staged-lookup route must agree (it remains the fallback
        # for stores without position information)
        lookup = ivf._stage()[5]  # the model's own id -> bucket-row table
        d_l, i_l = exact_rerank_staged(
            list_vecs.reshape(-1, 64), lookup, si, jnp.asarray(queries), 10
        )
        np.testing.assert_array_equal(np.asarray(i_q), np.asarray(i_l))
        exact = ivf_full_search_program(16, pad, 64, 8, 3, 10, exact=True)
        d_e, i_e = exact(
            centroids, c_sq, list_vecs, list_sqn, list_ids, jnp.asarray(queries)
        )
        np.testing.assert_array_equal(np.asarray(i_q), np.asarray(i_e))
        # elementwise-f32 (rerank) vs expanded-HIGHEST (kernel): same
        # value up to f32 cancellation
        np.testing.assert_allclose(
            np.asarray(d_q), np.asarray(d_e), rtol=1e-3, atol=5e-3
        )

    def test_ivf_model_scan_dtype_roundtrip(self):
        # scan_dtype/rerank_dtype survive serialization; CPU search stays
        # exact regardless of the scan store option.
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        rng = np.random.default_rng(21)
        pts = rng.standard_normal((256, 32)).astype(np.float32)
        ids = np.arange(256, dtype=np.int64)
        ivf = IVFFlatIndex(dim=32, nlist=4, nprobe=4, scan_dtype="int8")
        ivf.train(pts)
        ivf.add(pts, ids)
        d0, i0 = ivf.search(pts[:5] + 0.01, 5)
        import pathlib
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            p = pathlib.Path(td) / "x.memo"
            write_index(ivf, p)
            ivf2 = read_index(p)
        assert ivf2.scan_dtype == "int8"
        assert ivf2.rerank_dtype == "float32"
        d1, i1 = ivf2.search(pts[:5] + 0.01, 5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)

    def test_sq8_stage_quantizer_properties(self):
        # Per-dimension symmetric SQ8: |decode(encode(x)) - x| <= scale/2
        # elementwise on live rows, codes in [-127, 127], dec_sqn matches
        # the decoded norms, and padding never influences the scale.
        from c99_vectordb_tpu.models.ivf_flat import _sq8_stage

        rng = np.random.default_rng(33)
        lv = (rng.standard_normal((4, 64, 16)) * 5).astype(np.float32)
        li = np.full((4, 64), -1, np.int32)
        li[:, :40] = np.arange(160, dtype=np.int32).reshape(4, 40)
        lv[li < 0] = 1e6  # poison padding: must NOT blow up the scale
        codes, scale, dec_sqn = _sq8_stage(jnp.asarray(lv), jnp.asarray(li))
        codes, scale, dec_sqn = map(np.asarray, (codes, scale, dec_sqn))
        assert codes.min() >= -127 and codes.max() <= 127
        live = li >= 0
        maxabs_live = np.abs(lv[live]).max(axis=0)
        np.testing.assert_allclose(scale, maxabs_live / 127.0, rtol=1e-6)
        dec = codes.astype(np.float32) * scale
        err = np.abs(dec[live] - lv[live])
        assert (err <= scale / 2 + 1e-6).all()
        np.testing.assert_allclose(
            dec_sqn, np.einsum("lpd,lpd->lp", dec, dec), rtol=1e-5
        )

    def test_ivf_model_bf16_options_roundtrip(self):
        # bf16 scan + bf16 rerank: ONE shared device copy serves both
        # stores; params survive serialization; CPU search still returns
        # sane neighbors (scanning the bf16 store).
        from c99_vectordb_tpu.storage.index_io import read_index, write_index

        rng = np.random.default_rng(22)
        pts = (rng.standard_normal((256, 32)) * 3).astype(np.float32)
        ids = np.arange(256, dtype=np.int64)
        ivf = IVFFlatIndex(dim=32, nlist=4, nprobe=4,
                           scan_dtype="bfloat16", rerank_dtype="bfloat16")
        ivf.train(pts)
        ivf.add(pts, ids)
        staged = ivf._stage()
        assert staged[7][0] == "bfloat16"
        assert staged[2] is staged[7][1]  # shared single bf16 copy
        d0, i0 = ivf.search(pts[:5], 1)
        np.testing.assert_array_equal(i0[:, 0], ids[:5])  # self-NN
        import pathlib
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            p = pathlib.Path(td) / "x.memo"
            write_index(ivf, p)
            ivf2 = read_index(p)
        assert (ivf2.scan_dtype, ivf2.rerank_dtype) == ("bfloat16", "bfloat16")
        d1, i1 = ivf2.search(pts[:5], 1)
        np.testing.assert_array_equal(i0, i1)

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
