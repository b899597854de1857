"""Storage layer: path resolution, YAML canonicalization, lifecycle."""

import datetime
import textwrap

import pytest

from c99_vectordb_tpu.storage.paths import db_paths
from c99_vectordb_tpu.storage.yaml_store import RecordStore
from c99_vectordb_tpu.utils.text import is_blank_body, is_deleted_record


class TestPaths:
    def test_plain_basename(self, tmp_path):
        idx, yml = db_paths("notes", str(tmp_path))
        assert idx == tmp_path / "notes.memo"
        assert yml == tmp_path / "notes.yaml"

    def test_absolute(self, tmp_path):
        idx, yml = db_paths(str(tmp_path / "db"), "/elsewhere")
        assert idx == tmp_path / "db.memo"
        assert yml == tmp_path / "db.yaml"

    def test_relative_subdir(self, tmp_path):
        idx, yml = db_paths("sub/dir/notes", str(tmp_path))
        assert idx == tmp_path / "sub" / "dir" / "notes.memo"

    def test_dotted_basename_not_mangled(self, tmp_path):
        # Deliberate fix over reference quirk SURVEY.md §2.5 #13
        idx, yml = db_paths("my.db.v2", str(tmp_path))
        assert idx.name == "my.db.v2.memo"
        assert yml.name == "my.db.v2.yaml"


class TestRecordStore:
    def test_missing_file_is_empty(self, tmp_path):
        store = RecordStore.load(tmp_path / "nope.yaml")
        assert len(store) == 0

    def test_round_trip_canonical_shape(self, tmp_path):
        path = tmp_path / "db.yaml"
        store = RecordStore()
        store.append("hello world", {"source": "user"})
        store.append("second note", None)
        store.save(path)
        text = path.read_text()
        # canonical: --- starts, key order id/metadata/body, literal block body
        assert text.startswith("---\n")
        assert "id: 0\n" in text and "id: 1\n" in text
        assert "metadata:\n  source: user" in text or "metadata: {source: user}" in text
        assert "metadata: {}" in text  # None metadata dumps as {}
        assert "body: |" in text
        reloaded = RecordStore.load(path)
        assert reloaded.bodies == ["hello world", "second note"]
        assert reloaded.metas == [{"source": "user"}, {}]  # {} round-trips as {}

    def test_sparse_ids_densify(self, tmp_path):
        path = tmp_path / "db.yaml"
        path.write_text(
            textwrap.dedent(
                """\
                ---
                id: 3
                body: gap record
                """
            )
        )
        store = RecordStore.load(path)
        assert len(store) == 4
        assert store.bodies[:3] == ["", "", ""]
        assert store.bodies[3] == "gap record"
        assert store.metas[:3] == [None, None, None]

    def test_duplicate_id_rejected(self, tmp_path):
        path = tmp_path / "db.yaml"
        path.write_text("---\nid: 0\nbody: a\n---\nid: 0\nbody: b\n")
        with pytest.raises(ValueError, match="duplicate id 0"):
            RecordStore.load(path)

    def test_bad_shapes_rejected(self, tmp_path):
        path = tmp_path / "db.yaml"
        path.write_text("---\n- not\n- a\n- map\n")
        with pytest.raises(ValueError, match="mappings"):
            RecordStore.load(path)
        path.write_text("---\nid: -1\nbody: x\n")
        with pytest.raises(ValueError, match="non-negative"):
            RecordStore.load(path)
        path.write_text("---\nid: 0\nbody: 42\n")
        with pytest.raises(ValueError, match="must be a string"):
            RecordStore.load(path)

    def test_bool_id_accepted_as_int(self, tmp_path):
        # Reference parity: bool is int in Python, so `id: true` loads as
        # id 1 (memo_cli.py:79-100; ADVICE round 1 consistency finding).
        path = tmp_path / "db.yaml"
        path.write_text("---\nid: true\nbody: one\n---\nid: 0\nbody: zero\n")
        store = RecordStore.load(path)
        assert store.bodies == ["zero", "one"]
        assert type(next(iter(store))[0]) is int

    def test_compact_drops_and_resequences(self):
        store = RecordStore(
            bodies=["keep one", "", "deleted: true", "keep two"],
            metas=[None, None, None, {"deleted": 1}],
        )
        compacted, dropped = store.compact()
        assert dropped == 3  # blank, deleted-body, deleted-metadata
        assert compacted.bodies == ["keep one"]

    def test_multiline_body_round_trip(self, tmp_path):
        path = tmp_path / "db.yaml"
        store = RecordStore()
        store.append("line one\nline two\n  indented", {"k": [1, 2]})
        store.save(path)
        assert RecordStore.load(path).bodies[0] == "line one\nline two\n  indented"


class TestLifecycle:
    def test_blank_body(self):
        assert is_blank_body(None)
        assert is_blank_body("")
        assert is_blank_body("  \n\t ")
        assert not is_blank_body("x")

    def test_deleted_via_metadata(self):
        assert is_deleted_record({"deleted": True}, "body")
        assert is_deleted_record({"deleted": 1}, "body")
        assert not is_deleted_record({"deleted": 0}, "body")
        assert not is_deleted_record(None, "body")

    def test_deleted_via_yaml_body(self):
        assert is_deleted_record(None, "deleted: true")
        assert not is_deleted_record(None, "deleted: false")
        assert not is_deleted_record(None, "just text mentioning deleted")


class TestCDumperParity:
    """dump() must stay byte-identical to pure-Python SafeDumper output.

    yaml_store routes dump() through libyaml's C emitter when every
    string is provably parity-safe and falls back otherwise (non-BMP
    chars lose the literal block style under the C emitter; NEL/LS/PS
    get backslash-N-escaped in plain scalars). These cases pin both
    sides of that gate against the reference rendering (SafeDumper, the
    reference's own dump path: /root/reference/memo_cli.py:118-128).
    """

    CASES = [
        ("plain ascii body\n", {"k": "v"}),
        ("", None),
        ("no trailing newline", {}),
        ("trailing space \nnext\n", {"tags": ["a", "b"], "n": 3}),
        ("long " + "word " * 80 + "\n", {"long": "word " * 60}),
        ("unicode üñîсö中文\n", {"u": "éè"}),
        # C-emitter-unsafe: non-BMP emoji body must keep the literal block
        ("emoji \U0001f600 body\n", {"k": "v"}),
        # C-emitter-unsafe: NEL / LINE SEPARATOR in metadata plain scalars
        ("plain\n", {"s": "nelsep", "ls": "a b"}),
        ("ctrlchar\n", None),
        ("- looks like yaml\nkey: value\n", {"nested": {"a": [1, 2, {"b": "c"}]}}),
    ]

    def _reference_dump(self, store):
        import yaml

        from c99_vectordb_tpu.storage.yaml_store import block_str

        docs = [
            {"id": rid, "metadata": meta if meta is not None else {}, "body": block_str(body)}
            for rid, body, meta in store
        ]
        return yaml.dump_all(
            docs,
            Dumper=yaml.SafeDumper,
            explicit_start=True,
            sort_keys=False,
            allow_unicode=True,
        )

    def test_dump_byte_parity_per_case(self):
        for body, meta in self.CASES:
            store = RecordStore()
            store.append(body, meta)
            assert store.dump() == self._reference_dump(store), (body, meta)

    def test_dump_byte_parity_mixed_store(self):
        store = RecordStore()
        for body, meta in self.CASES:
            store.append(body, meta)
        assert store.dump() == self._reference_dump(store)

    def test_emoji_body_keeps_literal_block(self):
        store = RecordStore()
        store.append("emoji \U0001f600 body\n", None)
        assert "body: |" in store.dump()

    def test_c_loader_matches_safe_loader(self):
        import yaml

        store = RecordStore()
        for body, meta in self.CASES:
            store.append(body, meta)
        text = store.dump()
        py = list(yaml.load_all(text, Loader=yaml.SafeLoader))
        c_loader = getattr(yaml, "CSafeLoader", None)
        if c_loader is None:
            pytest.skip("libyaml not available")
        assert list(yaml.load_all(text, Loader=c_loader)) == py

    def test_round_trip_matches_reference_round_trip(self, tmp_path):
        # NEL/LS are YAML 1.1 line breaks, so they do NOT round-trip
        # verbatim in the reference stack either — the contract is that
        # our save+load equals the reference's dump+SafeLoader cycle.
        import yaml

        path = tmp_path / "db.yaml"
        store = RecordStore()
        for body, meta in self.CASES:
            store.append(body, meta)
        store.save(path)
        reloaded = RecordStore.load(path)
        ref_docs = list(yaml.load_all(self._reference_dump(store), Loader=yaml.SafeLoader))
        assert reloaded.bodies == [d["body"] for d in ref_docs]
        assert reloaded.metas == [d["metadata"] for d in ref_docs]


class TestSnapshotCache:
    """Parsed-store sidecar (storage/snapshot.py): hash-keyed, JSON-only,
    full fidelity for YAML-safe-load types, never load-bearing."""

    def _big_store(self, n=800):
        store = RecordStore()
        for i in range(n):
            store.append(
                f"record body {i} with enough text to push past the size threshold "
                + "filler " * 10 + "\n",
                {"i": i, "tag": ["a", "b"], "date": datetime.date(2026, 8, 17)},
            )
        return store

    def test_codec_round_trips_yaml_types(self):
        from c99_vectordb_tpu.storage.snapshot import _dec, _enc

        cases = [
            None, True, False, 0, -7, 2**80, 0.5, float("inf"), "s", "",
            [1, [2, {"k": "v"}]], {}, {"k": None},
            {1: "int key", ("a", 2): "tuple key", True: "bool key"},
            datetime.date(2026, 8, 17),
            datetime.datetime(2026, 8, 17, 1, 2, 3, 456789),
            datetime.datetime(2026, 8, 17, tzinfo=datetime.timezone(datetime.timedelta(hours=-5))),
            b"raw\x00bytes",
            {"nested": {"deep": [datetime.date(2000, 1, 1), b"x"]}},
        ]
        for v in cases:
            assert _dec(_enc(v)) == v, v
        nan = _dec(_enc(float("nan")))
        assert nan != nan

    def test_codec_rejects_exotic(self):
        from c99_vectordb_tpu.storage.snapshot import Unsnapshotable, _enc

        with pytest.raises(Unsnapshotable):
            _enc({"s": {1, 2}})

    def test_large_save_writes_snapshot_and_load_uses_it(self, tmp_path, monkeypatch):
        from c99_vectordb_tpu.storage import snapshot, yaml_store

        path = tmp_path / "db.yaml"
        store = self._big_store()
        store.save(path)
        sp = snapshot.snap_path(path)
        assert sp.exists()

        # Prove the snapshot path is taken: break the YAML parser.
        def boom(*a, **k):
            raise AssertionError("YAML parser must not run on a snapshot hit")

        monkeypatch.setattr(yaml_store.yaml, "load_all", boom)
        reloaded = RecordStore.load(path)
        assert reloaded.bodies == store.bodies
        assert reloaded.metas == store.metas

    def test_stale_snapshot_is_ignored_and_refreshed(self, tmp_path):
        from c99_vectordb_tpu.storage import snapshot

        path = tmp_path / "db.yaml"
        store = self._big_store()
        store.save(path)
        sp = snapshot.snap_path(path)

        # External edit: append a record straight to the YAML.
        with path.open("a", encoding="utf-8") as fh:
            fh.write("---\nid: 900\nmetadata: {}\nbody: externally appended\n")
        reloaded = RecordStore.load(path)
        assert reloaded.bodies[900] == "externally appended"
        # The miss re-parsed AND refreshed the sidecar to the new hash.
        assert snapshot.read_snapshot(sp, path.read_text(encoding="utf-8")) is not None

    def test_corrupt_snapshot_is_a_cache_miss(self, tmp_path):
        from c99_vectordb_tpu.storage import snapshot

        path = tmp_path / "db.yaml"
        store = self._big_store()
        store.save(path)
        snapshot.snap_path(path).write_text("{not json", encoding="utf-8")
        reloaded = RecordStore.load(path)
        assert reloaded.bodies == store.bodies

    def test_small_db_gets_no_sidecar(self, tmp_path):
        from c99_vectordb_tpu.storage import snapshot

        path = tmp_path / "db.yaml"
        store = RecordStore()
        store.append("tiny\n", {"k": "v"})
        store.save(path)
        assert not snapshot.snap_path(path).exists()

    def test_clean_removes_sidecar(self, tmp_path):
        from c99_vectordb_tpu import commands
        from c99_vectordb_tpu.storage import snapshot
        from c99_vectordb_tpu.storage.paths import db_paths

        _, yaml_path = db_paths("db", str(tmp_path))
        store = self._big_store()
        store.save(yaml_path)
        sp = snapshot.snap_path(yaml_path)
        assert sp.exists()
        assert commands.cmd_clean("db", str(tmp_path)) == 0
        assert not sp.exists()

    def test_plain_fast_path_round_trip(self, tmp_path):
        # JSON-native metadata stores untagged; exotic values fall back
        # to the tagged codec — both must reload identically.
        import json

        from c99_vectordb_tpu.storage import snapshot

        path = tmp_path / "db.yaml"
        plain_store = self._big_store()  # has a date -> NOT plain
        plain_store.save(path)
        payload = json.loads(snapshot.snap_path(path).read_text(encoding="utf-8"))
        assert payload["plain"] is False

        store2 = RecordStore()
        for i in range(800):
            store2.append("plain body %d %s\n" % (i, "y" * 60), {"i": i, "t": ["a", "b"]})
        path2 = tmp_path / "db2.yaml"
        store2.save(path2)
        payload2 = json.loads(snapshot.snap_path(path2).read_text(encoding="utf-8"))
        assert payload2["plain"] is True
        reloaded = RecordStore.load(path2)
        assert reloaded.bodies == store2.bodies
        assert reloaded.metas == store2.metas

    def test_type_damaged_snapshot_is_a_cache_miss(self, tmp_path):
        import json

        from c99_vectordb_tpu.storage import snapshot

        path = tmp_path / "db.yaml"
        store = self._big_store()
        store.save(path)
        sp = snapshot.snap_path(path)
        payload = json.loads(sp.read_text(encoding="utf-8"))
        payload["bodies"][5] = 42  # damage: non-string body, hash intact
        sp.write_text(json.dumps(payload), encoding="utf-8")
        reloaded = RecordStore.load(path)  # falls back to the YAML parse
        assert reloaded.bodies == store.bodies
