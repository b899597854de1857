"""Analytics formatting: field resolution, tables, stats blocks."""

from c99_vectordb_tpu.utils.reporting import (
    default_fields,
    format_cell,
    parse_iso_datetime,
    render_stats,
    render_table,
    resolve_field,
)


class TestFieldResolution:
    def test_id_and_metadata(self):
        meta = {"source": "user"}
        assert resolve_field(7, meta, "id") == 7
        assert resolve_field(7, meta, "metadata") == meta
        assert resolve_field(7, meta, "metadata.source") == "user"
        assert resolve_field(7, meta, "source") == "user"
        assert resolve_field(7, meta, "missing") is None

    def test_format_cell(self):
        assert format_cell(None) == ""
        assert format_cell(5) == "5"
        assert format_cell({"a": 1}) == "{a: 1}"
        assert format_cell([1, 2]) == "[1, 2]"

    def test_default_fields(self):
        matches = [(0, {"z": 1, "a": 2}), (1, {"m": 3, "b": 4})]
        assert default_fields(matches) == ["id", "a", "b", "m"]


class TestTable:
    def test_padded_columns(self):
        lines = render_table(["ID", "source"], [["0", "user"], ["10", "agent-long"]])
        assert lines[0] == "ID  source    "
        assert lines[1] == "0   user      "
        assert lines[2] == "10  agent-long"


class TestStats:
    def test_cardinality_top4_plus_other(self):
        matches = [(i, {"k": f"v{i % 6}"}) for i in range(12)]
        lines = render_stats(matches, "k")
        assert lines[0] == "Key: k"
        assert lines[1] == "Cardinality (distinct values): 6"
        assert lines[2] == "Cardinality by value:"
        assert any("other (aggregate of 2 additional values): 4" in ln for ln in lines)

    def test_numeric_range(self):
        matches = [(0, {"p": 1}), (1, {"p": 4}), (2, {"p": "2.5"})]
        lines = render_stats(matches, "p")
        assert "Range (numeric):" in lines
        assert "  min: 1" in lines
        assert "  max: 4" in lines
        assert "  avg: 2.50" in lines

    def test_date_range(self):
        matches = [(0, {"t": "2024-01-02T10:00:00"}), (1, {"t": "2024-03-04T10:00:00Z"})]
        # Mixed naive + tz-aware: reference crashes here (SURVEY §2.5 #11); we don't.
        lines = render_stats(matches, "t")
        assert "Range (date-like):" in lines
        assert "  start: 2024-01-02" in lines
        assert "  end:   2024-03-04" in lines

    def test_no_range_for_text(self):
        lines = render_stats([(0, {"k": "abc"}), (1, {"k": "def"})], "k")
        assert not any("Range" in ln for ln in lines)

    def test_iso_parsing(self):
        assert parse_iso_datetime("2024-01-01T00:00:00Z") is not None
        assert parse_iso_datetime("not a date") is None
        assert parse_iso_datetime(42) is None
        assert parse_iso_datetime("  ") is None
