"""Filter engine: every operator, combinators, and the contract's edge cases
(SURVEY.md §2.5 #6/#7)."""

import pytest

from c99_vectordb_tpu.utils.filters import matches, parse_filter


def match_expr(metadata, expr):
    return matches(metadata, parse_filter(expr))


class TestParse:
    def test_empty_and_blank(self):
        assert parse_filter("{}") == {}
        assert parse_filter("") == {}

    def test_braceless_single_key(self):
        assert parse_filter("source: user") == {"source": "user"}

    def test_braceless_multi_key_is_an_error(self):
        # Documented quirk: outer braces required for multi-key (SURVEY §2.5 #7)
        with pytest.raises(Exception):
            parse_filter("source: user, priority: {$gte: 2}")

    def test_non_mapping_rejected(self):
        with pytest.raises(ValueError, match="mapping"):
            parse_filter("[1, 2]")


class TestBareEquality:
    def test_string_equality_is_stringified(self):
        assert match_expr({"n": 5}, "{n: 5}")
        assert match_expr({"n": "5"}, "{n: 5}")  # str-compare both sides
        assert not match_expr({"n": 5}, "{n: 6}")

    def test_list_value_matches_any_element(self):
        assert match_expr({"tags": ["a", "b"]}, "{tags: b}")
        assert not match_expr({"tags": ["a", "b"]}, "{tags: c}")

    def test_missing_key_never_matches(self):
        assert not match_expr({"other": 1}, "{n: 1}")


class TestOperators:
    def test_gte_lte_numeric(self):
        assert match_expr({"p": 3}, "{p: {$gte: 2}}")
        assert match_expr({"p": 2}, "{p: {$gte: 2}}")
        assert not match_expr({"p": 1}, "{p: {$gte: 2}}")
        assert match_expr({"p": 1}, "{p: {$lte: 2}}")
        assert not match_expr({"p": 3}, "{p: {$lte: 2}}")

    def test_gte_string_compare_when_not_both_numeric(self):
        assert match_expr({"v": "b"}, "{v: {$gte: a}}")
        assert not match_expr({"v": "a"}, "{v: {$gte: b}}")
        # mixed types fall back to string compare: "10" < "9" lexically
        assert match_expr({"v": "10"}, "{v: {$lte: '9'}}")

    def test_ne(self):
        assert match_expr({"s": "x"}, "{s: {$ne: y}}")
        assert not match_expr({"s": "x"}, "{s: {$ne: x}}")

    def test_ne_missing_key_is_false(self):
        # Missing key fails even $ne (SURVEY §2.5 #12 note / reference :201-202)
        assert not match_expr({}, "{s: {$ne: x}}")

    def test_prefix(self):
        assert match_expr({"s": "hello world"}, "{s: {$prefix: hello}}")
        assert not match_expr({"s": "world hello"}, "{s: {$prefix: hello}}")
        assert not match_expr({"s": 123}, "{s: {$prefix: '1'}}")  # non-str value

    def test_contains(self):
        assert match_expr({"tags": ["a", "b"]}, "{tags: {$contains: a}}")
        assert not match_expr({"tags": "ab"}, "{tags: {$contains: a}}")  # non-list
        assert match_expr({"tags": [1, 2]}, "{tags: {$contains: '2'}}")  # stringified

    def test_unknown_operator_is_false(self):
        assert not match_expr({"p": 5}, "{p: {$gt: 1}}")

    def test_multi_op_mapping_is_false(self):
        assert not match_expr({"p": 5}, "{p: {$gte: 1, $lte: 9}}")


class TestCombinators:
    def test_implicit_and(self):
        meta = {"source": "user", "priority": 3}
        assert match_expr(meta, "{source: user, priority: {$gte: 2}}")
        assert not match_expr(meta, "{source: user, priority: {$gte: 4}}")

    def test_and_list(self):
        meta = {"a": 1, "b": 2}
        assert match_expr(meta, "{$and: [{a: 1}, {b: 2}]}")
        assert not match_expr(meta, "{$and: [{a: 1}, {b: 3}]}")
        assert not match_expr(meta, "{$and: {a: 1}}")  # non-list => False

    def test_or_list(self):
        meta = {"a": 1}
        assert match_expr(meta, "{$or: [{a: 2}, {a: 1}]}")
        assert not match_expr(meta, "{$or: [{a: 2}, {a: 3}]}")

    def test_nested(self):
        meta = {"source": "user", "priority": 5}
        assert match_expr(meta, "{$or: [{source: agent}, {priority: {$gte: 4}}]}")

    def test_empty_filter_matches_everything(self):
        assert match_expr({"anything": 1}, "{}")
