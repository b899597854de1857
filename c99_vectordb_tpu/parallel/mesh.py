"""Device mesh construction for multi-chip search.

The corpus axis (database rows) maps to the `data` mesh axis — the
retrieval analog of data parallelism (SURVEY.md §2.3): every chip scores
its shard of the corpus and contributes a partial top-k. The embedding
axis (vector dim) optionally maps to a `model` axis, splitting each
query x shard matmul across chips with a psum over partial inner
products — tensor parallelism for the scoring matmul. Both collectives
ride ICI when the mesh matches the physical slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))
