"""Driver contract: entry() compiles single-chip; dryrun_multichip runs a
full distributed training + serving step on the virtual mesh."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dists, ids = out
    assert dists.shape == (8, 10)
    assert ids.shape == (8, 10)
    assert (dists[:, 1:] >= dists[:, :-1]).all()  # ascending per query


def test_dryrun_multichip_eight():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_two():
    graft.dryrun_multichip(2)
