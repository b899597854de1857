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


def make_host_chip_mesh(n_hosts: int, n_chips: int, devices=None) -> Mesh:
    """Build a ("host", "chip") mesh for hierarchical two-level merges.

    On a real multi-host slice the outer axis maps to hosts (collectives
    over it ride DCN) and the inner to each host's chips (ICI); the
    two-level merge (parallel/sharded.py) reduces within `chip` first so
    only k candidates per HOST cross the slow axis. On CI this factors the
    8 virtual CPU devices, e.g. 2 x 4.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = n_hosts * n_chips
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_hosts, n_chips)
    return Mesh(grid, ("host", "chip"))


def default_data_mesh() -> Mesh:
    """All available devices on a 1D `data` axis (the sharded index
    families' default when no mesh is supplied)."""
    return make_mesh(n_data=len(jax.devices()), n_model=1)
