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

_platform_locked = False
_cpu_selected = False


def platform_decision(choice: str, ntotal_hint: int, threshold: int) -> str | None:
    """Pure decision: which platform should this invocation run on?

    Returns "cpu", an explicit platform string, or None (keep the process
    default, i.e. the TPU). The product use case (memo-scale DBs of tens
    to thousands of records) must answer in milliseconds like the CPU
    reference does (memo_cli.py:292) — TPU dispatch latency plus remote
    compile only pays off at corpus scale, so `auto` routes small corpora
    to CPU and reserves the TPU for ntotal >= threshold.
    """
    choice = (choice or "auto").strip().lower()
    if choice in ("", "auto"):
        return "cpu" if ntotal_hint < threshold else None
    if choice in ("default", "tpu"):
        return None
    return choice


def select_platform(ntotal_hint: int) -> str | None:
    """Pick the JAX platform for this CLI invocation (idempotent).

    Must run BEFORE the first backend touch (jit / device_put /
    default_backend) — in this container jax is pre-imported with the
    platform baked into the environment, so the only effective override
    is jax.config.update("jax_platforms", ...) prior to backend init.

    Env knobs:
      C99VDB_PLATFORM      = auto (default) | cpu | tpu | <platform name>
      C99VDB_CPU_THRESHOLD = corpus-size cutoff for auto (default 100000)
    """
    global _platform_locked, _cpu_selected
    target = platform_decision(
        os.environ.get("C99VDB_PLATFORM", "auto"),
        ntotal_hint,
        int(os.environ.get("C99VDB_CPU_THRESHOLD", "100000")),
    )
    if _platform_locked:
        return target
    _platform_locked = True
    if target is not None:
        try:
            import jax

            jax.config.update("jax_platforms", target)
            # config.update silently no-ops when the backend is already
            # initialized (embedded use), so VERIFY the switch before
            # dropping the persistent cache: CPU compiles are fast and
            # stale-host CPU AOT entries warn/SIGILL, but a process that
            # stayed on TPU still needs the cache for remote compiles.
            if target == "cpu" and jax.default_backend() == "cpu":
                _cpu_selected = True
                jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass  # backend already up (embedded use); honor the existing one
    return target


def configure_jax_cache() -> None:
    if _cpu_selected:
        return  # CPU compiles are fast; stale-host AOT entries warn/SIGILL
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
