"""Golden CLI transcripts: drive the memo-compatible CLI end-to-end through
the §2.4 contract (SURVEY.md) and assert exact stdout/stderr separation."""

import numpy as np
import pytest
import yaml

from c99_vectordb_tpu.cli import main


@pytest.fixture
def run(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)

    def invoke(*args):
        rc = main(["memo", *args])
        captured = capsys.readouterr()
        return rc, captured.out, captured.err

    return invoke


def write_input(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


SAVE_INPUT = """\
---
metadata:
  source: user
  priority: 2
body: I prefer tea over coffee
---
metadata:
  source: agent
  priority: 5
  tags: [health]
body: |
  User mentioned a preference for
  morning workouts
---
metadata: {source: user, priority: 1}
body: Remember to file taxes in April
"""


class TestHelp:
    def test_no_args_shows_help(self, run):
        rc, out, err = run()
        assert rc == 0
        assert out.startswith("Usage:\n  memo --help\n")
        assert "  reindex             Rebuild <base>.memo from <base>.yaml (full regenerate)" in out
        assert err == ""

    def test_help_flag(self, run):
        rc, out, _ = run("--help")
        assert rc == 0 and "Usage:" in out

    def test_missing_f(self, run):
        rc, out, err = run("recall", "hello")
        assert rc == 1
        assert err == "Error: -f <base> is required\n"
        assert "Usage:" in out  # help printed to stdout after the error

    def test_unknown_command(self, run):
        rc, out, err = run("-f", "db", "frobnicate")
        assert rc == 1
        assert err == "Error: unknown command 'frobnicate'\n"
        assert "Usage:" in out


class TestSaveRecall:
    def test_save_prints_memorized_lines(self, run, tmp_path):
        path = write_input(tmp_path, "in.yaml", SAVE_INPUT)
        rc, out, err = run("-f", "db", "save", path)
        assert rc == 0
        lines = out.splitlines()
        assert lines[0] == "Memorized: 'I prefer tea over coffee' (ID: 0)"
        # multiline body: the Memorized line spans the body's lines verbatim
        assert lines[1] == "Memorized: 'User mentioned a preference for"
        assert lines[2] == "morning workouts"
        assert lines[3] == "' (ID: 1)"
        assert lines[4] == "Memorized: 'Remember to file taxes in April' (ID: 2)"
        assert (tmp_path / "db.yaml").exists()
        assert (tmp_path / "db.memo").exists()
        assert err == ""

    def test_recall_text_format(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, err = run("-f", "db", "recall", "-k", "1", "tea or coffee preference")
        assert rc == 0
        lines = out.splitlines()
        assert lines[0] == "Top 1 results:"
        assert lines[1].startswith("  [0] Score: ")
        assert lines[1].endswith(" |")
        assert lines[2] == "      I prefer tea over coffee"
        assert len(lines) == 3

    def test_recall_multiline_body_indent(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "morning workouts preference")
        lines = out.splitlines()
        assert lines[1].startswith("  [1] Score: ")
        assert lines[2] == "      User mentioned a preference for"
        assert lines[3] == "      morning workouts"

    def test_recall_empty_db(self, run):
        rc, out, err = run("-f", "db", "recall", "anything")
        assert rc == 0
        assert out == "Top 2 results:\n"
        assert err == ""

    def test_recall_yaml_mode(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "recall", "--yaml", "-k", "2", "tea coffee")
        assert rc == 0
        parsed = yaml.safe_load(out)
        assert len(parsed["results"]) == 2
        first = parsed["results"][0]
        assert set(first) == {"id", "score", "body"}
        assert first["id"] == 0
        assert isinstance(first["score"], float)

    def test_recall_yaml_empty_db(self, run):
        rc, out, _ = run("-f", "db", "recall", "--yaml", "q")
        assert rc == 0
        assert out == "results: []\n"

    def test_recall_filter_post_filters(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run(
            "-f", "db", "recall", "-k", "5", "--filter", "{source: agent}", "preference"
        )
        lines = out.splitlines()
        assert lines[0] == "Top 5 results:"
        # Only the one agent-sourced record survives the post-filter
        assert sum(1 for ln in lines if ln.startswith("  [")) == 1
        assert lines[1].startswith("  [1] ")

    def test_recall_unknown_flags_join_query(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "recall", "--bogus", "tea")
        assert rc == 0  # "--bogus tea" is the query
        assert out.splitlines()[0] == "Top 2 results:"

    def test_recall_empty_query_error(self, run):
        rc, _, err = run("-f", "db", "recall")
        assert rc == 1
        assert err == "Error: recall requires <query>\n"

    def test_recall_k_clamped(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "recall", "-k", "1000", "tea")
        assert out.splitlines()[0] == "Top 100 results:"
        rc, out, _ = run("-f", "db", "recall", "-k", "-3", "tea")
        assert out.splitlines()[0] == "Top 1 results:"

    def test_recall_scores_are_squared_l2(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "I prefer tea over coffee")
        # identical text => identical embedding => distance 0.0000
        assert "[0] Score: 0.0000 |" in out

    def test_cross_process_determinism(self, run, tmp_path):
        """The reference breaks here (salted hash, SURVEY §2.5 #1): vectors
        saved now must match queries embedded by a different process. We
        emulate by comparing against a freshly recomputed embedding."""
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        from c99_vectordb_tpu.ops.embed import embed_text
        from c99_vectordb_tpu.storage.index_io import read_index

        index = read_index(tmp_path / "db.memo")
        q = embed_text("I prefer tea over coffee")
        dists, ids = index.search(q[None], k=1)
        assert ids[0, 0] == 0
        assert dists[0, 0] < 1e-6


class TestMoreParity:
    def test_global_flags_position_independent(self, run, tmp_path):
        # -f may come after the command words (reference scans argv globally)
        path = write_input(tmp_path, "in.yaml", SAVE_INPUT)
        rc, out, _ = run("save", path, "-f", "db")
        assert rc == 0
        assert out.splitlines()[0].startswith("Memorized:")

    def test_recall_yaml_with_filter(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run(
            "-f", "db", "recall", "--yaml", "-k", "5", "--filter",
            "{priority: {$gte: 3}}", "preference",
        )
        parsed = yaml.safe_load(out)
        assert [r["id"] for r in parsed["results"]] == [1]

    def test_stats_date_range_via_cli(self, run, tmp_path):
        docs = (
            "---\nmetadata: {t: '2024-01-02T10:00:00Z'}\nbody: a\n"
            "---\nmetadata: {t: '2024-03-04T10:00:00Z'}\nbody: b\n"
        )
        run("-f", "db3", "save", write_input(tmp_path, "d.yaml", docs))
        rc, out, _ = run("-f", "db3", "analyze", "--filter", "{}", "--stats", "t")
        lines = out.splitlines()
        assert "Range (date-like):" in lines
        assert "  start: 2024-01-02" in lines
        assert "  end:   2024-03-04" in lines

    def test_invalid_filter_after_header(self, run, tmp_path):
        # reference parses the filter AFTER printing the header line
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, err = run("-f", "db", "recall", "--filter", "{bad: [", "q")
        assert rc == 1
        assert out == "Top 2 results:\n"
        assert err.startswith("Error: invalid --filter expression:")

    def test_k_requires_integer(self, run):
        rc, _, err = run("-f", "db", "recall", "-k", "abc", "q")
        assert rc == 1
        assert err == "Error: -k requires an integer\n"

    def test_empty_filter_string_hides_metadataless(self, run, tmp_path):
        mixed = "---\nbody: no meta note\n---\nmetadata: {s: 1}\nbody: with meta note\n"
        run("-f", "db4", "save", write_input(tmp_path, "m.yaml", mixed))
        rc, out, _ = run("-f", "db4", "recall", "-k", "5", "--filter", "{}", "note")
        shown = [ln for ln in out.splitlines() if ln.startswith("  [")]
        assert len(shown) == 1
        assert shown[0].startswith("  [1]")


class TestOverwrite:
    def test_overwrite_by_id(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        update = "---\nid: 0\nmetadata: {source: user}\nbody: I now prefer coffee\n"
        rc, out, _ = run("-f", "db", "save", write_input(tmp_path, "up.yaml", update))
        assert rc == 0
        assert out == "Memorized: 'I now prefer coffee' (ID: 0)\n"
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "I now prefer coffee")
        assert "[0] Score: 0.0000 |" in out

    def test_overwrite_missing_id_errors(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        bad = "---\nid: 99\nbody: nope\n"
        rc, _, err = run("-f", "db", "save", write_input(tmp_path, "bad.yaml", bad))
        assert rc == 1
        assert err == "Error: override id 99 does not exist\n"


class TestAnalyze:
    def setup_db(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))

    def test_matched_count_and_table(self, run, tmp_path):
        self.setup_db(run, tmp_path)
        rc, out, _ = run("-f", "db", "analyze", "--filter", "{source: user}")
        lines = out.splitlines()
        assert lines[0] == "Matched: 2"
        assert lines[1].split() == ["ID", "priority", "source"]
        assert lines[2].split() == ["0", "2", "user"]
        assert lines[3].split() == ["2", "1", "user"]

    def test_fields_projection(self, run, tmp_path):
        self.setup_db(run, tmp_path)
        rc, out, _ = run(
            "-f", "db", "analyze", "--filter", "{}", "--fields", "id,metadata.priority"
        )
        lines = out.splitlines()
        assert lines[0] == "Matched: 3"
        assert lines[1].split() == ["ID", "metadata.priority"]

    def test_stats_mode(self, run, tmp_path):
        self.setup_db(run, tmp_path)
        rc, out, _ = run("-f", "db", "analyze", "--filter", "{}", "--stats", "priority")
        lines = out.splitlines()
        assert lines[0] == "Matched: 3"
        assert lines[1] == "Key: priority"
        assert "Range (numeric):" in lines
        assert "  avg: 2.67" in lines

    def test_limit_offset_paging(self, run, tmp_path):
        self.setup_db(run, tmp_path)
        rc, out, _ = run(
            "-f", "db", "analyze", "--filter", "{}", "--limit", "1", "--offset", "1"
        )
        lines = out.splitlines()
        assert lines[0] == "Matched: 3"
        assert len(lines) == 3  # header + 1 row

    def test_filter_required(self, run):
        rc, _, err = run("-f", "db", "analyze")
        assert rc == 1
        assert err == "Error: analyze requires --filter <expr>\n"

    def test_unknown_option_rejected(self, run):
        rc, _, err = run("-f", "db", "analyze", "--filter", "{}", "--what", "x")
        assert rc == 1
        assert err == "Error: unknown analyze option '--what'\n"

    def test_validation_messages(self, run, tmp_path):
        self.setup_db(run, tmp_path)
        rc, _, err = run("-f", "db", "analyze", "--filter", "{}", "--limit", "0")
        assert err == "Error: --limit must be >= 1\n"
        rc, _, err = run("-f", "db", "analyze", "--filter", "{}", "--offset", "-1")
        assert err == "Error: --offset must be >= 0\n"

    def test_no_metadata_records_never_match(self, run, tmp_path):
        nometa = "---\nbody: bare note without metadata\n"
        run("-f", "db2", "save", write_input(tmp_path, "nm.yaml", nometa))
        rc, out, _ = run("-f", "db2", "analyze", "--filter", "{}")
        assert out.splitlines()[0] == "Matched: 0"


class TestCleanReindex:
    def test_clean_messages(self, run, tmp_path):
        idx, yml = tmp_path / "db.memo", tmp_path / "db.yaml"
        rc, out, _ = run("-f", "db", "clean")
        assert rc == 0
        assert out == f"Database already empty ({idx}, {yml})\n"
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run("-f", "db", "clean")
        assert out == f"Cleared memory database ({idx}, {yml})\n"
        assert not idx.exists() and not yml.exists()

    def test_reindex_output_and_compaction(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        # Soft-delete record 1 via metadata
        update = "---\nid: 1\nmetadata: {deleted: true}\nbody: tombstone\n"
        run("-f", "db", "save", write_input(tmp_path, "del.yaml", update))
        rc, out, _ = run("-f", "db", "reindex")
        assert rc == 0
        lines = out.splitlines()
        assert lines[0] == "Rebuilt index from db.yaml"
        assert lines[1] == "Wrote index: db.memo"
        assert lines[2] == "Compacted: dropped 1 blank/deleted entries"
        # ids re-sequenced: remaining records are 0..1
        rc, out, _ = run("-f", "db", "analyze", "--filter", "{}", "--fields", "id")
        assert out.splitlines()[0] == "Matched: 2"

    def test_reindex_recovers_corrupt_index(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        (tmp_path / "db.memo").write_bytes(b"corrupted!")
        rc, out, _ = run("-f", "db", "reindex")
        assert rc == 0
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "tea coffee")
        assert "  [0] Score: " in out

    def test_clean_extra_args_rejected(self, run):
        rc, _, err = run("-f", "db", "clean", "extra")
        assert err == "Error: clean does not accept extra arguments\n"
        rc, _, err = run("-f", "db", "reindex", "extra")
        assert err == "Error: reindex does not accept extra arguments\n"


class TestEdgePaths:
    def test_mixed_save_overwrite_and_append(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        mixed = (
            "---\nid: 0\nmetadata: {source: user}\nbody: replaced zero\n"
            "---\nmetadata: {source: new}\nbody: appended note\n"
        )
        rc, out, _ = run("-f", "db", "save", write_input(tmp_path, "mix.yaml", mixed))
        assert rc == 0
        lines = out.splitlines()
        assert lines[0] == "Memorized: 'replaced zero' (ID: 0)"
        assert lines[1] == "Memorized: 'appended note' (ID: 3)"
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "appended note")
        assert out.splitlines()[1].startswith("  [3] Score: ")

    def test_recall_with_missing_index_file(self, run, tmp_path):
        # YAML exists, index gone: silent fresh index => header only,
        # reindex is the documented recovery path
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        (tmp_path / "db.memo").unlink()
        rc, out, err = run("-f", "db", "recall", "tea")
        assert rc == 0
        assert out == "Top 2 results:\n"
        run("-f", "db", "reindex")
        rc, out, _ = run("-f", "db", "recall", "-k", "1", "tea coffee")
        assert "  [0] Score: " in out

    def test_analyze_whole_metadata_column(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, _ = run(
            "-f", "db", "analyze", "--filter", "{source: agent}",
            "--fields", "id,metadata",
        )
        lines = out.splitlines()
        assert lines[0] == "Matched: 1"
        assert lines[1].split()[:2] == ["ID", "metadata"]
        assert "source: agent" in lines[2]

    def test_save_into_subdirectory_base(self, run, tmp_path):
        rc, out, _ = run(
            "-f", "deep/dir/db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT)
        )
        assert rc == 0
        assert (tmp_path / "deep" / "dir" / "db.yaml").exists()
        assert (tmp_path / "deep" / "dir" / "db.memo").exists()


class TestVerbose:
    def test_verbose_goes_to_stderr_only(self, run, tmp_path):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        rc, out, err = run("-f", "db", "-v", "reindex")
        assert rc == 0
        assert "Rebuilt index with 3 vectors (skipped 0 blank records)" in err
        assert "Rebuilt index with" not in out


class TestFaissMigration:
    def test_reference_shaped_memo_hints_reindex(self, run, tmp_path):
        # A reference-created .memo (FAISS IndexIDMap2 fourcc) must emit
        # the one-line stderr migration hint, recall nothing (fresh
        # index), and fully recover via reindex (VERDICT round 2,
        # missing #1).
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        (tmp_path / "db.memo").write_bytes(b"IxM2" + b"\x00" * 32)
        rc, out, err = run("-f", "db", "recall", "-k", "1", "tea")
        assert rc == 0
        assert out == "Top 1 results:\n"  # empty index, header only
        assert "FAISS-format index" in err and "reindex" in err
        rc, _, _ = run("-f", "db", "reindex")
        assert rc == 0
        rc, out, err = run("-f", "db", "recall", "-k", "1", "tea coffee")
        assert "  [0] Score: " in out
        assert "FAISS-format" not in err


class TestServe:
    """`serve` — resident-index extension verb: one query per stdin line,
    byte-identical recall blocks, blank-line separated."""

    def _feed(self, monkeypatch, text):
        import io

        monkeypatch.setattr("sys.stdin", io.StringIO(text))

    def test_serve_blocks_match_one_shot_recalls(self, run, tmp_path, monkeypatch):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        _, one_a, _ = run("-f", "db", "recall", "-k", "2", "tea preference")
        _, one_b, _ = run("-f", "db", "recall", "-k", "2", "morning workout")

        self._feed(monkeypatch, "tea preference\n\nmorning workout\n")
        rc, out, err = run("-f", "db", "serve", "-k", "2")
        assert rc == 0
        assert out == one_a + "\n" + one_b + "\n"
        assert err == ""

    def test_serve_yaml_and_filter(self, run, tmp_path, monkeypatch):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        _, one, _ = run("-f", "db", "recall", "--yaml", "-k", "1",
                        "--filter", "{source: user}", "tea")
        self._feed(monkeypatch, "tea\n")
        rc, out, _ = run("-f", "db", "serve", "--yaml", "-k", "1",
                         "--filter", "{source: user}")
        assert rc == 0
        assert out == one + "...\n"  # YAML doc-end terminator per block

    def test_serve_yaml_blocks_frame_despite_blank_lines(self, run, tmp_path,
                                                         monkeypatch):
        # Multi-paragraph bodies put TRUE blank lines inside a --yaml
        # block, so a blank line cannot frame the stream; the `...`
        # terminator (YAML doc-end, never at column 0 inside the
        # indented dump) can. Readers split on it and parse each block.
        run("-f", "db", "save", write_input(
            tmp_path, "in.yaml",
            "---\nbody: |\n  first paragraph\n\n  second paragraph\n"))
        self._feed(monkeypatch, "first\nsecond\n")
        rc, out, _ = run("-f", "db", "serve", "--yaml", "-k", "1")
        assert rc == 0
        blocks = [b for b in out.split("...\n") if b.strip()]
        assert len(blocks) == 2
        docs = [yaml.safe_load(b) for b in blocks]
        assert all("results" in d for d in docs)
        assert "\n\n" in docs[0]["results"][0]["body"]

    def test_serve_rejects_positional_and_bad_filter(self, run, monkeypatch):
        rc, out, err = run("-f", "db", "serve", "stray")
        assert rc == 1 and "unknown serve option 'stray'" in err
        self._feed(monkeypatch, "")
        rc, out, err = run("-f", "db", "serve", "--filter", "{bad yaml")
        assert rc == 1 and err.startswith("Error: invalid --filter")

    def test_serve_not_in_help(self, run):
        _, out, _ = run("--help")
        assert "serve" not in out  # reference help surface is byte-pinned

    def test_serve_batch_matches_single_mode(self, run, tmp_path, monkeypatch):
        """--batch N ranks a whole batch in ONE device program
        (index.ranked_many_device) but must emit byte-identical output to
        the per-query mode — including across a padded final flush (3
        queries at --batch 4 pad to the pow2 program shape)."""
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        queries = "tea preference\nmorning workout\ntaxes april\n"

        self._feed(monkeypatch, queries)
        rc, single, err = run("-f", "db", "serve", "-k", "2")
        assert rc == 0 and err == ""

        for b in (2, 4):  # mid-stream flush at 2; padded EOF flush at 4
            self._feed(monkeypatch, queries)
            rc, batched, err = run("-f", "db", "serve", "-k", "2",
                                   "--batch", str(b))
            assert rc == 0 and err == ""
            assert batched == single

    def test_serve_batch_blank_line_flushes(self, run, tmp_path, monkeypatch):
        # With --batch larger than the stream, a blank line must flush
        # the pending queries (it is the explicit flush marker) — the
        # first answer appears even though the batch never fills.
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        self._feed(monkeypatch, "tea\n\nworkout\n")
        rc, out, _ = run("-f", "db", "serve", "-k", "1", "--batch", "64")
        assert rc == 0
        assert out.count("Top 1 results:") == 2

    def test_serve_batch_with_filter_matches_single(self, run, tmp_path,
                                                    monkeypatch):
        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))
        args = ("-f", "db", "serve", "--yaml", "-k", "1",
                "--filter", "{source: user}")
        self._feed(monkeypatch, "tea\nworkout\n")
        rc, single, _ = run(*args)
        assert rc == 0
        self._feed(monkeypatch, "tea\nworkout\n")
        rc, batched, _ = run(*args, "--batch", "2")
        assert rc == 0
        assert batched == single

    def test_serve_batch_rejects_bad_values(self, run, monkeypatch):
        rc, _, err = run("-f", "db", "serve", "--batch")
        assert rc == 1 and "--batch requires an integer" in err
        rc, _, err = run("-f", "db", "serve", "--batch", "zero")
        assert rc == 1 and "--batch requires an integer" in err
        rc, _, err = run("-f", "db", "serve", "--batch", "0")
        assert rc == 1 and "--batch must be >= 1" in err

    def test_serve_reloads_on_external_write(self, run, tmp_path, monkeypatch):
        """A serving process must answer from the CURRENT DB after an
        external writer republished it (stat-keyed reload, same
        semantics as MemoDB's resident caches)."""
        import io
        import os
        import time

        from c99_vectordb_tpu import commands

        run("-f", "db", "save", write_input(tmp_path, "in.yaml", SAVE_INPUT))

        class FeedAndMutate(io.StringIO):
            """Stdin that appends a new record between the two queries."""

            def __init__(self, outer):
                super().__init__()
                self.lines = iter(["workout\n", "MUTATE", "zebra safari\n"])
                self.outer = outer

            def __iter__(self):
                for item in self.lines:
                    if item == "MUTATE":
                        rc = commands.cmd_save(
                            "db",
                            write_input(tmp_path, "extra.yaml",
                                        "---\nbody: zebra safari trip\n"),
                            str(tmp_path), False)
                        assert rc == 0
                        future = time.time() + 2
                        for n in ("db.yaml", "db.memo"):
                            p = tmp_path / n
                            os.utime(p, (future, future))
                        continue
                    yield item

        monkeypatch.setattr("sys.stdin", FeedAndMutate(tmp_path))
        rc, out, err = run("-f", "db", "serve", "-k", "1")
        assert rc == 0
        assert "zebra safari trip" in out  # served the post-write record
