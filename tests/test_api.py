"""Embedded Python API (MemoDB) semantics."""

import pytest

from c99_vectordb_tpu.api import MemoDB


@pytest.fixture
def db(tmp_path):
    return MemoDB("notes", cwd=str(tmp_path))


class TestMemoDB:
    def test_save_and_recall(self, db):
        rid = db.save("I prefer tea over coffee", metadata={"source": "user"})
        assert rid == 0
        db.save("quarterly tax filings", metadata={"source": "agent"})
        hits = db.recall("tea preference", k=1)
        assert len(hits) == 1
        assert hits[0].doc_id == 0
        assert hits[0].body == "I prefer tea over coffee"
        assert hits[0].metadata == {"source": "user"}
        assert hits[0].score >= 0.0

    def test_save_many_batches(self, db):
        ids = db.save_many(
            [
                {"body": "alpha note", "metadata": {"n": 1}},
                {"body": "beta note", "metadata": {"n": 2}},
            ]
        )
        assert ids == [0, 1]
        assert len(db) == 2

    def test_filter_recall(self, db):
        db.save("red apples", metadata={"color": "red"})
        db.save("green apples", metadata={"color": "green"})
        hits = db.recall("apples", k=5, filter="{color: green}")
        assert [h.doc_id for h in hits] == [1]

    def test_overwrite(self, db):
        db.save("original", metadata=None)
        db.save("other", metadata=None)
        db.save("replacement text", doc_id=0)
        hits = db.recall("replacement text", k=1)
        assert hits[0].doc_id == 0

    def test_overwrite_missing_raises(self, db):
        db.save("only record")
        with pytest.raises(KeyError, match="override id 5"):
            db.save("nope", doc_id=5)

    def test_analyze(self, db):
        db.save("a", metadata={"p": 1})
        db.save("b", metadata={"p": 2})
        db.save("c")  # no metadata: never matches
        assert [i for i, _ in db.analyze("{p: {$gte: 2}}")] == [1]

    def test_reindex_compacts(self, db):
        db.save("keep me")
        db.save("delete me", metadata={"deleted": True})
        dropped = db.reindex()
        assert dropped == 1
        assert len(db) == 1
        assert db.recall("keep me", k=1)[0].doc_id == 0

    def test_clean(self, db):
        assert db.clean() is False
        db.save("x")
        assert db.clean() is True
        assert len(db) == 0

    def test_empty_recall(self, db):
        assert db.recall("anything") == []


def test_recall_many_batched(tmp_path):
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([
        {"body": f"note about {'tea' if i % 2 else 'coffee'} number {i}",
         "metadata": {"source": "user" if i % 2 else "agent"}}
        for i in range(20)
    ])
    single = [db.recall(q, k=3) for q in ("tea", "coffee")]
    batched = db.recall_many(["tea", "coffee"], k=3)
    # Flat index: batched search == single-query ranking prefixes.
    for s, b in zip(single, batched):
        assert [h.doc_id for h in b] == [h.doc_id for h in s]
    # Filtered, pushdown (default): parity with post-filtered recall.
    fs = db.recall("tea", k=3, filter="{source: user}")
    fb = db.recall_many(["tea"], k=3, filter="{source: user}")[0]
    assert [h.doc_id for h in fb] == [h.doc_id for h in fs]
    assert db.recall_many([], k=3) == []


def test_recall_many_widens_through_filter_misses(tmp_path):
    # Review r4 #3: a fixed fetch window under-filled k when matching
    # records were sparse in the ranking; recall_many must widen.
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([
        {"body": f"coffee note {i}",
         "metadata": {"source": "user" if i % 8 == 0 else "agent"}}
        for i in range(40)
    ])
    post = db.recall("coffee", k=5, filter="{source: user}")
    assert len(post) == 5
    wide = db.recall_many(["coffee"], k=5, filter="{source: user}",
                          pushdown=False)[0]
    assert [h.doc_id for h in wide] == [h.doc_id for h in post]


def test_recall_pushdown_widens_and_bounds_by_mask(tmp_path):
    # VERDICT r4 weak #7: recall(pushdown=True) must share recall_many's
    # fill guarantee. A sparse mask (2 matching records) must return
    # exactly those two — and not trigger a widening loop past the
    # mask's popcount.
    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([
        {"body": f"tea note {i}",
         "metadata": {"source": "user" if i in (17, 31) else "agent"}}
        for i in range(40)
    ])
    post = db.recall("tea", k=5, filter="{source: user}", pushdown=False)
    pushed = db.recall("tea", k=5, filter="{source: user}", pushdown=True)
    assert [h.doc_id for h in pushed] == [h.doc_id for h in post]
    assert sorted(h.doc_id for h in pushed) == [17, 31]

    # k=1 with a sparse mask: fill from the pushed-down scan alone.
    one = db.recall("tea", k=1, filter="{source: user}", pushdown=True)
    assert len(one) == 1 and one[0].doc_id == post[0].doc_id

    # Nothing matches: clean empty result.
    none = db.recall("tea", k=3, filter="{source: missing}", pushdown=True)
    assert none == []


def test_resident_cache_reuses_and_invalidates(tmp_path):
    """Serving contract: repeated recalls reuse the SAME loaded index and
    store objects (no per-call reload/restage — BASELINE.md round 5);
    mutations through the instance publish the mutated objects back; an
    external file change invalidates by stat."""
    import os
    import time

    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([{"body": f"note {i}"} for i in range(6)])

    idx1 = db._index()
    store1 = db._store()
    db.recall("note", k=2)
    assert db._index() is idx1 and db._store() is store1

    # A mutation through the instance keeps the warm objects resident.
    db.save("fresh note")
    idx2 = db._index()
    assert idx2 is db._index()
    assert idx2.ntotal == 7

    # An out-of-band writer (second instance) changes the files; the
    # first instance must pick the change up by stat.
    other = MemoDB(str(tmp_path / "db"))
    other.save("outside note")
    future = time.time() + 2
    for p in (db.records_path, db.index_path):
        os.utime(p, (future, future))  # defeat same-ns mtime collisions
    idx3 = db._index()
    assert idx3 is not idx2
    assert idx3.ntotal == 8
    assert len(db._store()) == 8


def test_failed_save_leaves_no_phantom_record(tmp_path, monkeypatch):
    """A mutator that dies mid-flight (e.g. a transient device error in
    index.add) must not leave the in-place-mutated store in the resident
    cache — the next call would silently persist a record that was never
    indexed (round-5 review finding)."""
    import pytest

    from c99_vectordb_tpu.api import MemoDB

    db = MemoDB(str(tmp_path / "db"))
    db.save_many([{"body": f"note {i}"} for i in range(4)])

    index = db._index()
    real_add = index.add

    def boom(*a, **k):
        raise RuntimeError("transient device error")

    monkeypatch.setattr(index, "add", boom)
    with pytest.raises(RuntimeError):
        db.save("phantom")
    monkeypatch.setattr(index, "add", real_add)

    # Cache was dropped: state reloads from disk, no phantom anywhere.
    assert len(db) == 4
    assert all("phantom" not in h.body for h in db.recall("phantom", k=4))
    nid = db.save("real fifth note")
    assert nid == 4 and len(db) == 5
