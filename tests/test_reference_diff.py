"""Differential parity: run the LIVE reference's pure-host functions
against the rebuild on shared fixtures (VERDICT round 1, item 7).

faiss isn't installed, but ~80% of /root/reference/memo_cli.py is pure
host code (paths, YAML store, filters, stats, tables, parsers, help) that
never touches it at import time (annotations are strings under
`from __future__ import annotations`). A stub faiss module lets the real
reference load, turning the round-1 hand-derived golden expectations into
machine-checked diffs. Deliberate deviations (SURVEY.md §2.5 #1/#11/#13)
get their own tests asserting the DIFFERENCE.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest
import yaml

from c99_vectordb_tpu import cli
from c99_vectordb_tpu.storage.paths import db_paths
from c99_vectordb_tpu.storage.yaml_store import RecordStore
from c99_vectordb_tpu.utils import filters, reporting, text


@pytest.fixture(scope="module")
def ref():
    if "faiss" not in sys.modules:
        stub = types.ModuleType("faiss")
        stub.IndexIDMap2 = type("IndexIDMap2", (), {})
        stub.IndexHNSWFlat = type("IndexHNSWFlat", (), {})
        stub.read_index = stub.write_index = stub.vector_to_array = None
        sys.modules["faiss"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_memo_cli", "/root/reference/memo_cli.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_memo_cli"] = mod  # dataclass resolves cls.__module__
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- fixtures

RECORD_SETS = [
    # (bodies, metas)
    (["hello world"], [None]),
    (["a", "b\nc\nd", ""], [{"k": 1}, None, {"x": "y", "z": [1, 2]}]),
    (["unicode: café — ü"], [{"tag": "café"}]),
    (
        ["line one\n  indented\nlast", "trailing spaces  ", "x"],
        [{"a": {"nested": True}}, {}, None],
    ),
]

METADATA_CASES = [
    {},
    {"source": "user"},
    {"source": "user", "priority": 2},
    {"priority": "2"},
    {"tags": ["a", "b"]},
    {"tags": []},
    {"value": 3.5},
    {"value": None},
    {"name": "prefix_test"},
    {"nested": {"deep": 1}},
    {"mixed": [1, "two"]},
]

FILTER_CASES = [
    {},
    {"source": "user"},
    {"source": "admin"},
    {"priority": 2},
    {"priority": "2"},
    {"priority": {"$gte": 2}},
    {"priority": {"$lte": 1}},
    {"priority": {"$ne": 2}},
    {"missing": {"$ne": "x"}},
    {"name": {"$prefix": "pre"}},
    {"tags": {"$contains": "a"}},
    {"tags": {"$contains": "z"}},
    {"tags": "a"},
    {"value": {"$gte": 3}},
    {"value": {"$unknown": 1}},
    {"value": {"$gte": 1, "$lte": 5}},  # two ops in one map -> False
    {"$and": [{"source": "user"}, {"priority": {"$gte": 2}}]},
    {"$or": [{"source": "admin"}, {"priority": 2}]},
    {"$and": "notalist"},
    {"$or": [{"source": "user"}, "bare"]},
    {"nested": {"deep": 1}},  # dict condition with non-$ key -> False
    {"source": "user", "priority": {"$gte": 1}},
]


# ---------------------------------------------------------------- contract


def test_help_text_byte_identical(ref, capsys):
    ref.print_help()
    want = capsys.readouterr().out
    cli.print_help()
    got = capsys.readouterr().out
    assert got == want


def test_canonical_yaml_dump_byte_identical(ref, tmp_path):
    for bodies, metas in RECORD_SETS:
        p = tmp_path / "ref.yaml"
        ref.save_yaml_tables(p, bodies, metas)
        store = RecordStore(bodies=list(bodies), metas=list(metas))
        assert store.dump() == p.read_text(encoding="utf-8")


def test_yaml_load_equivalence(ref, tmp_path):
    texts = [
        # canonical, sparse ids, odd formatting, flow metadata
        "---\nid: 0\nbody: alpha\n---\nid: 3\nmetadata: {k: v}\nbody: |-\n  two\n  lines\n",
        "id: 5\nbody: 'only one, quoted'\nmetadata:\n  a: 1\n",
        "",
        "--- null\n--- {id: 0, body: x}\n",
    ]
    for text_db in texts:
        p = tmp_path / "db.yaml"
        p.write_text(text_db, encoding="utf-8")
        want_bodies, want_metas = ref.load_yaml_tables(p)
        store = RecordStore.load(p)
        assert store.bodies == want_bodies
        assert store.metas == want_metas


def test_yaml_load_errors_match(ref, tmp_path):
    bad = [
        "---\n- a\n- b\n",
        "---\nbody: x\n",
        "---\nid: -1\nbody: x\n",
        "---\nid: 0\nbody: 1\n",
        "---\nid: 0\nbody: x\nmetadata: [1]\n",
        "---\nid: 0\nbody: x\n---\nid: 0\nbody: y\n",
    ]
    for text_db in bad:
        p = tmp_path / "db.yaml"
        p.write_text(text_db, encoding="utf-8")
        with pytest.raises(ValueError) as ref_err:
            ref.load_yaml_tables(p)
        with pytest.raises(ValueError) as our_err:
            RecordStore.load(p)
        assert str(our_err.value) == str(ref_err.value)


def test_lifecycle_helpers_match(ref):
    bodies = ["", "  \n\t ", "text", None, "deleted: true", "deleted: false",
              "just words", "a: 1", "[not, a, map]", ": bad yaml ["]
    metas = [None, {}, {"deleted": True}, {"deleted": 0}, {"deleted": "yes"}]
    for b in bodies:
        assert text.is_blank_body(b) == ref.is_blank_body(b), repr(b)
        for m in metas:
            assert text.is_deleted_record(m, b) == ref.is_deleted_record(m, b), (m, b)
    for s in ["a  b\t\nc", "  x  ", "", "\n\n"]:
        assert text.collapse_whitespace(s) == ref.normalize_whitespace(s)


def test_filter_engine_matches(ref):
    for meta in METADATA_CASES:
        for filt in FILTER_CASES:
            assert filters.matches(meta, filt) == ref.matches_filter(meta, filt), (
                meta, filt,
            )


def test_filter_parse_matches(ref):
    ok = ["{}", "", "source: user", "{a: 1, b: {$gte: 2}}", "a: [1, 2]"]
    for expr in ok:
        assert filters.parse_filter(expr) == ref.parse_yaml_flow_map(expr)
    bad = ["[1, 2]", "just a string", "3"]
    for expr in bad:
        with pytest.raises(ValueError):
            ref.parse_yaml_flow_map(expr)
        with pytest.raises(ValueError):
            filters.parse_filter(expr)
    # Braceless multi-key is a YAML scan error in both (SURVEY §2.5 #7).
    expr = "source: user, priority: {$gte: 2}"
    with pytest.raises(yaml.YAMLError):
        ref.parse_yaml_flow_map(expr)
    with pytest.raises(Exception):
        filters.parse_filter(expr)


STATS_CASES = [
    ([(0, {"k": "a"}), (1, {"k": "b"}), (2, {"k": "a"})], "k"),
    ([(i, {"k": f"v{i}"}) for i in range(7)], "k"),          # top-4 + other
    ([(0, {"n": 1}), (1, {"n": "2.5"}), (2, {"n": 3})], "n"),  # numeric range
    ([(0, {"d": "2024-01-01"}), (1, {"d": "2024-06-01T10:00:00"})], "d"),
    ([(0, {"d": "2024-01-01T00:00:00Z"}), (1, {"d": "2024-06-01T00:00:00Z"})], "d"),
    ([(0, {"lst": [1, 2]}), (1, {"lst": [3]})], "lst"),      # cardinality only
    ([(0, {"other": 1})], "k"),                               # no values
    ([], "k"),
    ([(0, {"k": "x"}), (5, {})], "id"),                       # id stats
]


def test_stats_render_matches(ref, capsys):
    for matches_list, key in STATS_CASES:
        ref.print_stats(matches_list, key)
        want = capsys.readouterr().out
        got = "".join(line + "\n" for line in reporting.render_stats(matches_list, key))
        assert got == want, (matches_list, key)


def test_mixed_tz_stats_is_a_documented_deviation(ref):
    # Reference crashes on mixed tz-aware/naive datetimes (§2.5 #11); the
    # rebuild deliberately doesn't.
    mixed = [(0, {"d": "2024-01-01T00:00:00Z"}), (1, {"d": "2024-01-02T00:00:00"})]
    with pytest.raises(TypeError):
        ref.print_stats(mixed, "d")
    out = reporting.render_stats(mixed, "d")
    assert any("start" in line for line in out)


def test_table_and_fields_match(ref, capsys):
    matches_list = [
        (0, {"source": "user", "priority": 2}),
        (3, {"source": "sys", "tags": ["a"], "zz": None}),
    ]
    assert reporting.default_fields(matches_list) == ref.default_analyze_fields(
        matches_list
    )
    for field in ["id", "metadata", "metadata.source", "source", "missing"]:
        for doc_id, meta in matches_list:
            assert reporting.resolve_field(doc_id, meta, field) == (
                ref.resolve_field_value(doc_id, meta, field)
            )
    for value in [None, "x", 3, 2.5, {"a": 1}, [1, "b"], True]:
        assert reporting.format_cell(value) == ref.format_cell(value)

    headers = ["ID", "source", "priority"]
    rows = [["0", "user", "2"], ["3", "sys", ""]]
    ref.print_table(headers, rows)
    want = capsys.readouterr().out
    got = "".join(line + "\n" for line in reporting.render_table(headers, rows))
    assert got == want


def test_datetime_parse_matches(ref):
    for v in ["2024-01-01", "2024-01-01T10:20:30Z", "2024-01-01T10:20:30+02:00",
              "", "  ", "not a date", 42, None, "2024-13-01"]:
        assert reporting.parse_iso_datetime(v) == ref.parse_iso_datetime(v)


# ---------------------------------------------------------------- parsers


ARGV_CASES = [
    ["memo"],
    ["memo", "-f", "db", "recall", "hi"],
    ["memo", "recall", "-f", "db", "hi"],        # -f anywhere
    ["memo", "-v", "-f", "db", "clean"],
    ["memo", "-f"],
    ["memo", "-f", "  "],
    ["memo", "-f", "db", "-v"],
]


def test_global_parser_matches(ref, capsys):
    for argv in ARGV_CASES:
        want, want_rc = ref.parse_args(argv)
        want_err = capsys.readouterr().err
        got, got_rc = cli.split_global_args(argv)
        got_err = capsys.readouterr().err
        assert got_rc == want_rc, argv
        assert got_err == want_err, argv
        if want_rc == 0:
            assert got == want, argv


RECALL_CASES = [
    ["hello", "world"],
    ["-k", "5", "query"],
    ["-k", "0", "query"],
    ["-k", "500", "query"],
    ["-k", "x", "query"],
    ["-k"],
    ["--filter", "{a: 1}", "q"],
    ["--filter"],
    ["--yaml", "q"],
    ["--unknown-flag", "joins", "query"],
    ["-j", "5", "also", "joins"],
    [],
    ["--yaml"],
]


def test_recall_parser_matches(ref, capsys):
    for args in RECALL_CASES:
        want, want_rc = ref.parse_recall_args(args)
        want_err = capsys.readouterr().err
        got, got_rc = cli.parse_recall_args(args)
        got_err = capsys.readouterr().err
        assert (got_rc, got_err) == (want_rc, want_err), args
        if want_rc == 0:
            assert got == want, args


ANALYZE_CASES = [
    ["--filter", "{a: 1}"],
    ["--filter", "{a: 1}", "--fields", "id, source"],
    ["--filter", "{a: 1}", "--fields", " , "],
    ["--filter", "{a: 1}", "--stats", "k"],
    ["--filter", "{a: 1}", "--stats", "  "],
    ["--filter", "{a: 1}", "--limit", "5", "--offset", "2"],
    ["--filter", "{a: 1}", "--limit", "x"],
    ["--filter", "{a: 1}", "--bogus"],
    ["--filter"],
    [],
    ["--fields", "id"],
]


def test_analyze_parser_matches(ref, capsys):
    for args in ANALYZE_CASES:
        want, want_rc = ref.parse_analyze_args(args)
        want_err = capsys.readouterr().err
        got, got_rc = cli.parse_analyze_args(args)
        got_err = capsys.readouterr().err
        assert (got_rc, got_err) == (want_rc, want_err), args
        if want_rc == 0:
            assert got == want, args


# ---------------------------------------------------------------- commands


def test_analyze_command_end_to_end_matches(ref, tmp_path, capsys):
    db = tmp_path / "db.yaml"
    store = RecordStore(
        bodies=["a", "b", "c", "d", ""],
        metas=[
            {"source": "user", "priority": 2},
            {"source": "sys", "priority": 1},
            {"source": "user", "tags": ["x", "y"]},
            None,
            {"source": "user"},
        ],
    )
    store.save(db)

    from c99_vectordb_tpu import commands

    cases = [
        ("{source: user}", None, None, 100, 0),
        ("{source: user}", ["id", "metadata"], None, 100, 0),
        ("{priority: {$gte: 1}}", None, "priority", 100, 0),
        ("{source: user}", None, None, 2, 1),
        ("{nope: 1}", None, None, 100, 0),
    ]
    for filt, fields, stats, limit, offset in cases:
        want_rc = ref.command_analyze("db", filt, fields, stats, limit, offset, str(tmp_path))
        want = capsys.readouterr()
        got_rc = commands.cmd_analyze("db", filt, fields, stats, limit, offset, str(tmp_path))
        got = capsys.readouterr()
        assert got_rc == want_rc
        assert got.out == want.out, (filt, fields, stats)
        assert got.err == want.err


def test_path_resolution_deviation_documented(ref, tmp_path):
    # Parity for undotted and path-y basenames...
    for base in ["db", "sub/db", "/abs/db"]:
        assert db_paths(base, str(tmp_path)) == ref.build_db_paths(base, str(tmp_path))
    # ...and the DELIBERATE fix for dotted basenames (§2.5 #13): the
    # reference mangles `my.db.v2` -> my.db.memo; the rebuild appends.
    ref_idx, _ = ref.build_db_paths("my.db.v2", str(tmp_path))
    our_idx, _ = db_paths("my.db.v2", str(tmp_path))
    assert ref_idx.name == "my.db.memo"
    assert our_idx.name == "my.db.v2.memo"


def test_verbose_rebuild_log_byte_identical(ref, capsys, monkeypatch):
    """The -v rebuild line (reference memo_cli.py:284) is the one stderr
    surface shared by both implementations (VERDICT round 2, missing #2);
    assert byte parity. The reference's embed + FAISS insert are stubbed
    out — only the logging contract is under test."""
    import numpy as np

    from c99_vectordb_tpu import commands

    class _IdxStub:
        def add_with_ids(self, vecs, ids):
            pass

    monkeypatch.setattr(ref, "create_index", lambda: _IdxStub())
    monkeypatch.setattr(
        ref, "embed_text_hash", lambda text: np.zeros((384,), np.float32)
    )

    bodies = ["hello", "", "   ", "world notes", "deleted: true"]
    ref.rebuild_index_from_texts(list(bodies), verbose=True)
    want = capsys.readouterr().err
    commands.build_index_from_store(list(bodies), verbose=True)
    got = capsys.readouterr().err
    assert "Rebuilt index with" in want
    assert got == want
