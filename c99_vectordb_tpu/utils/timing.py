"""Observability: verbose stage timing and optional device profiling.

The reference's only observability is -v prints to stderr (SURVEY.md §5).
This module keeps that contract (stderr only, results never polluted) and
adds:
  - `stage(verbose, name)`: wall-clock per-stage timing lines under -v
  - C99VDB_TRACE=<dir>: wraps the stage in a jax.profiler trace, producing
    TensorBoard-loadable device profiles of the actual TPU execution
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager


@contextmanager
def stage(verbose: bool, name: str):
    trace_dir = os.environ.get("C99VDB_TRACE")
    start = time.perf_counter()
    if trace_dir:
        import jax

        with jax.profiler.trace(os.path.join(trace_dir, name.replace(" ", "_"))):
            yield
    else:
        yield
    if verbose:
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        print(f"[timing] {name}: {elapsed_ms:.1f} ms", file=sys.stderr)
