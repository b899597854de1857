"""c99_vectordb_tpu — TPU-native vector index & semantic memory engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `memo` v2 CLI (mikesmullin/c99-vectordb): a YAML source-of-truth
record database, a derived on-device vector index, and the five verbs
`save` / `recall` / `analyze` / `clean` / `reindex` with Mongo-style
metadata filtering.

Layer map (TPU-first, see SURVEY.md §7):
  - storage/   host-side YAML record store + versioned index serialization
  - utils/     deterministic hashing, text lifecycle, filter engine, reporting
  - ops/       JAX/Pallas compute kernels (embed, distances, top-k, k-means, PQ)
  - models/    index families: Flat (exact), IVF-Flat, IVF-PQ
  - parallel/  mesh sharding: per-chip partial top-k + all-gather merge
  - cli.py     the memo-compatible command-line interface
"""

__version__ = "0.1.0"

from .constants import DIM, MAX_K  # noqa: F401
