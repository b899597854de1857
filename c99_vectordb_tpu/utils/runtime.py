"""JAX runtime configuration for CLI invocations.

Every memo CLI call is a fresh Python process, and XLA's in-memory
executable cache dies with the process. On TPU (especially with remote
compile) that means paying full compile latency per invocation for the
same few program shapes. Enabling JAX's persistent compilation cache
makes the second-and-later invocations reuse compiled executables from
disk, reducing per-command latency from minutes (cold) to seconds.

Override the location with C99VDB_XLA_CACHE; set it empty to disable.
"""

from __future__ import annotations

import os


def configure_jax_cache() -> None:
    cache_dir = os.environ.get(
        "C99VDB_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "c99_vectordb_tpu", "xla"),
    )
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: these tiny CLI programs compile fast on CPU but
        # cross the compile-RPC boundary on remote-compile TPU setups.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Cache is an optimization; never let it break a command.
        pass
