"""Per-process worker for the REAL multi-process mesh check (VERDICT r3
next #4): two OS processes x 4 virtual CPU devices each, joined by
`jax.distributed.initialize` over a localhost coordinator, executing the
(host, chip) two-level merge ACROSS the process boundary — the DCN-side
half of SURVEY §5 that single-process virtual meshes cannot exercise
(`parallel/mesh.py` only relabels in-process devices).

Launched by tests/test_multiprocess.py (and usable standalone):

    python benchmarks/mp_worker.py <process_id> <num_processes> <port>

Each process:
  1. forces the CPU platform + 4 virtual devices (the conftest recipe —
     this container pre-imports jax, so config must be set before the
     first backend touch),
  2. joins the distributed runtime (process axis == the mesh's `host`
     axis, so the level-2 all_gather rides the gRPC/DCN boundary),
  3. builds GLOBAL arrays from process-local shards
     (jax.make_array_from_callback — the multi-host staging pattern:
     every process materializes only its addressable rows),
  4. runs sharded_search_2level and checks the replicated output against
     a local numpy oracle. Prints "PARITY OK" and exits 0 on success.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

# FORCE 4 local devices, overriding any inherited count (a pytest parent
# exports --xla_force_host_platform_device_count=8 via conftest).
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from c99_vectordb_tpu.parallel.sharded import sharded_search_2level

    local_per_proc = 4
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == local_per_proc
    assert jax.device_count() == nproc * local_per_proc

    # host axis == PROCESS boundary: row p of the grid is process p's
    # devices, so `host` collectives genuinely cross processes.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    grid = np.array(devs).reshape(nproc, local_per_proc)
    for p in range(nproc):
        assert all(d.process_index == p for d in grid[p]), "grid rows != processes"
    mesh = Mesh(grid, ("host", "chip"))

    n, dim, b, k = 4096, 64, 4, 5
    rng = np.random.default_rng(0)  # same seed everywhere: same globals
    db = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    sq = np.einsum("nd,nd->n", db, db).astype(np.float32)
    queries = rng.standard_normal((b, dim)).astype(np.float32)

    def gshard(x, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    prog = sharded_search_2level(mesh, n, dim, b, k)
    d_out, i_out = prog(
        gshard(db, P(("host", "chip"), None)),
        gshard(ids, P(("host", "chip"))),
        gshard(sq, P(("host", "chip"))),
        gshard(queries, P(None, None)),
    )
    d_np = np.asarray(d_out)
    i_np = np.asarray(i_out)

    exact = ((queries[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    want_i = np.argsort(exact, axis=1)[:, :k]
    want_d = np.sort(exact, axis=1)[:, :k]
    if not np.array_equal(i_np, want_i):
        print(f"PARITY FAIL ids (proc {pid}): {i_np} vs {want_i}", flush=True)
        return 1
    if not np.allclose(d_np, want_d, rtol=1e-4, atol=1e-4):
        print(f"PARITY FAIL dists (proc {pid})", flush=True)
        return 1
    print(f"PARITY OK (proc {pid}/{nproc}, {jax.device_count()} global devices)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
