"""The CLI contract holds identically across index families (engine choice
via C99VDB_INDEX env var; output contract unchanged)."""

import pytest

from c99_vectordb_tpu.cli import main

INPUT = """\
---
metadata: {source: user}
body: the cat sat on the mat
---
metadata: {source: agent}
body: quarterly tax filings are due in april
---
metadata: {source: user}
body: morning run along the river
"""


@pytest.fixture
def run(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "in.yaml").write_text(INPUT)

    def invoke(*args):
        rc = main(["memo", *args])
        captured = capsys.readouterr()
        return rc, captured.out, captured.err

    return invoke


@pytest.mark.parametrize(
    "kind",
    ["flat", "ivf_flat", "ivf_pq", "sharded_flat", "sharded_ivf", "sharded_ivf_pq"],
)
def test_save_recall_reindex_cycle(run, monkeypatch, kind):
    monkeypatch.setenv("C99VDB_INDEX", kind)
    monkeypatch.setenv("C99VDB_NLIST", "2")
    monkeypatch.setenv("C99VDB_NPROBE", "2")
    monkeypatch.setenv("C99VDB_PQ_M", "8")

    rc, out, err = run("-f", "db", "save", "in.yaml")
    assert rc == 0
    assert out.splitlines()[0] == "Memorized: 'the cat sat on the mat' (ID: 0)"

    rc, out, _ = run("-f", "db", "recall", "-k", "1", "cat sat mat")
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "Top 1 results:"
    assert lines[1].startswith("  [0] Score: ")
    assert lines[2] == "      the cat sat on the mat"

    rc, out, _ = run("-f", "db", "reindex")
    assert rc == 0
    assert out.splitlines()[0] == "Rebuilt index from db.yaml"

    rc, out, _ = run("-f", "db", "recall", "-k", "1", "quarterly tax april")
    assert out.splitlines()[1].startswith("  [1] Score: ")


@pytest.mark.parametrize("scan_dtype", ["bfloat16", "int8"])
def test_flat_scan_dtype_cycle(run, monkeypatch, scan_dtype):
    # scan_dtype variants keep the identical CLI contract and round-trip
    # through reindex (state()/from_state() preserves the option).
    monkeypatch.setenv("C99VDB_INDEX", "flat")
    monkeypatch.setenv("C99VDB_SCAN_DTYPE", scan_dtype)

    rc, out, _ = run("-f", "db", "save", "in.yaml")
    assert rc == 0

    rc, out, _ = run("-f", "db", "reindex")
    assert rc == 0

    rc, out, _ = run("-f", "db", "recall", "-k", "1", "cat sat mat")
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "Top 1 results:"
    assert lines[1].startswith("  [0] Score: ")
    assert lines[2] == "      the cat sat on the mat"


@pytest.mark.parametrize(
    "kind", ["ivf_flat", "ivf_pq", "sharded_flat", "sharded_ivf", "sharded_ivf_pq"]
)
def test_incremental_add_after_train(run, monkeypatch, tmp_path, kind):
    monkeypatch.setenv("C99VDB_INDEX", kind)
    monkeypatch.setenv("C99VDB_NLIST", "2")
    run("-f", "db", "save", "in.yaml")
    (tmp_path / "more.yaml").write_text("---\nbody: a brand new note about sailing\n")
    rc, out, _ = run("-f", "db", "save", "more.yaml")
    assert rc == 0
    assert out == "Memorized: 'a brand new note about sailing' (ID: 3)\n"
    rc, out, _ = run("-f", "db", "recall", "-k", "1", "sailing note")
    assert out.splitlines()[1].startswith("  [3] Score: ")

def test_ivf_pq_ksub16_cycle(run, monkeypatch):
    # The 4-bit (nibble-packed) PQ point keeps the identical CLI contract
    # and round-trips ksub through reindex (state()/from_state()).
    monkeypatch.setenv("C99VDB_INDEX", "ivf_pq")
    monkeypatch.setenv("C99VDB_NLIST", "2")
    monkeypatch.setenv("C99VDB_PQ_M", "8")
    monkeypatch.setenv("C99VDB_PQ_KSUB", "16")

    rc, out, _ = run("-f", "db", "save", "in.yaml")
    assert rc == 0
    rc, out, _ = run("-f", "db", "reindex")
    assert rc == 0
    rc, out, _ = run("-f", "db", "recall", "-k", "1", "cat sat mat")
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "Top 1 results:"
    assert lines[1].startswith("  [0] Score: ")
    assert lines[2] == "      the cat sat on the mat"
