"""Corpus-scale index-family usage: the layer BELOW the memo CLI.

The CLI embeds text and routes everything through the registry; at
corpus scale (millions of pre-embedded vectors) applications use the
index families directly. Every family shares the same contract
(models/base.VectorIndex): add / search (batched, ascending (distance,
id), empty slots (inf, -1)) / ranked_all / state round-trip through
storage/index_io.py.

Run:  python examples/corpus_scale.py          (CPU demo shapes; the
                                                same code is the TPU
                                                fast path at 1M+)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    from c99_vectordb_tpu.models.flat import FlatIndex
    from c99_vectordb_tpu.models.ivf_flat import IVFFlatIndex
    from c99_vectordb_tpu.models.ivf_pq import IVFPQIndex
    from c99_vectordb_tpu.storage.index_io import read_index, write_index

    rng = np.random.default_rng(0)
    n, dim = 20_000, 128
    # clustered corpus (what real embedding distributions look like)
    centers = rng.standard_normal((64, dim)).astype(np.float32) * 4.0
    vectors = (
        centers[rng.integers(0, 64, n)]
        + rng.standard_normal((n, dim)).astype(np.float32)
    )
    ids = np.arange(n, dtype=np.int64)
    queries = vectors[:4] + 0.01

    # -- Flat: exact, the recall-1.0 reference ---------------------------
    # On TPU the scan runs the fused Pallas kernel; scan_dtype="int8"
    # stages SQ8 codes for the double-rate int8 MXU path (results stay
    # exact via the f32 rerank — the 1M x 768 headline is ~100k QPS).
    flat = FlatIndex(dim=dim, scan_dtype="int8")
    flat.add(vectors, ids)
    d, i = flat.search(queries, k=5)
    print("flat exact       :", i[0], d[0].round(2))

    # -- IVF-Flat: the deployed default ----------------------------------
    # nlist ~ corpus cluster count; scan_dtype="int8" + exact rerank is
    # the fastest strict-recall-1.0 configuration (0.7-1.3M QPS at 1M).
    ivf = IVFFlatIndex(dim=dim, nlist=64, nprobe=8, scan_dtype="int8")
    ivf.train(vectors)
    ivf.add(vectors, ids)
    d, i = ivf.search(queries, k=5, nprobe=8)
    print("ivf_flat p=8     :", i[0], d[0].round(2))

    # -- IVF-PQ: the compressed regime ------------------------------------
    # m bytes/vector codes scanned by the gather-free ADC kernel; the
    # refine stage re-ranks a deep shortlist exactly.
    pq = IVFPQIndex(dim=dim, nlist=64, nprobe=8, m=16, refine=True,
                    refine_factor=8)
    pq.train(vectors)
    pq.add(vectors, ids)
    d, i = pq.search(queries, k=5)
    print("ivf_pq refined   :", i[0], d[0].round(2))
    print(f"  codes: {pq.code_bytes_per_vector} B/vector vs {4 * dim} raw")

    # -- Multi-chip: same contract over a device mesh --------------------
    # Slot-sharded lists divide per-chip scan work by the mesh size; on
    # CI this runs on virtual CPU devices, on hardware over ICI.
    from c99_vectordb_tpu.parallel import ShardedIVFIndex, make_mesh

    import jax

    mesh = make_mesh(n_data=min(2, len(jax.devices())))
    sharded = ShardedIVFIndex(dim=dim, nlist=64, nprobe=8, mesh=mesh)
    sharded.load(vectors, ids)
    d, i = sharded.search(queries, k=5)
    print("sharded_ivf      :", i[0], d[0].round(2))
    print("  per-chip rows  :", sharded.scan_rows_per_chip(b=4))

    # -- Persistence: any family round-trips the versioned container ----
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "corpus.memo"
        write_index(ivf, path)
        loaded = read_index(path)
        d2, i2 = loaded.search(queries, k=5, nprobe=8)
        print("round-trip kind  :", loaded.kind, "ntotal:", loaded.ntotal)


if __name__ == "__main__":
    main()
