"""Native C++ tokenizer/hasher vs the Python reference implementation."""

import numpy as np
import pytest

from c99_vectordb_tpu import native
from c99_vectordb_tpu.constants import DIM
from c99_vectordb_tpu.utils.hashing import batch_token_features, token_features


def python_batch(texts, dim):
    rows, buckets, signs = [], [], []
    for i, t in enumerate(texts):
        b, s = token_features(t, dim)
        rows.append(np.full((len(b),), i, np.int32))
        buckets.append(b)
        signs.append(s)
    return (
        np.concatenate(rows) if rows else np.zeros(0, np.int32),
        np.concatenate(buckets) if buckets else np.zeros(0, np.int32),
        np.concatenate(signs) if signs else np.zeros(0, np.float32),
    )


CORPUS = [
    "Hello World hello",
    "the_quick brown-fox; jumps!! over 42 lazy_dogs",
    "",
    "   \t\n  ",
    "UPPER lower MiXeD 0123 _underscore_",
    "a" * 500 + " b",
]


class TestNativeHasher:
    def test_library_builds(self):
        assert native.lib() is not None, "native build failed (g++ present in image)"

    def test_matches_python_exactly(self):
        rows_n, buckets_n, signs_n = batch_token_features(CORPUS, DIM)
        rows_p, buckets_p, signs_p = python_batch(CORPUS, DIM)
        np.testing.assert_array_equal(rows_n, rows_p)
        np.testing.assert_array_equal(buckets_n, buckets_p)
        np.testing.assert_array_equal(signs_n, signs_p)

    def test_non_ascii_falls_back_consistently(self):
        texts = ["héllo wörld", "plain ascii text"]
        rows, buckets, signs = batch_token_features(texts, DIM)
        rows_p, buckets_p, signs_p = python_batch(texts, DIM)
        np.testing.assert_array_equal(buckets, buckets_p)
        np.testing.assert_array_equal(signs, signs_p)

    def test_large_corpus_round_trip(self):
        rng = np.random.default_rng(0)
        words = ["alpha", "beta", "gamma", "delta", "x9", "_private"]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(1, 40)))
            for _ in range(500)
        ]
        rows_n, buckets_n, signs_n = batch_token_features(texts, DIM)
        rows_p, buckets_p, signs_p = python_batch(texts, DIM)
        np.testing.assert_array_equal(rows_n, rows_p)
        np.testing.assert_array_equal(buckets_n, buckets_p)
        np.testing.assert_array_equal(signs_n, signs_p)

    def test_disabled_via_env(self, monkeypatch):
        # fallback path still produces identical output
        rows_p, buckets_p, signs_p = python_batch(CORPUS, DIM)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        rows, buckets, signs = batch_token_features(CORPUS, DIM)
        np.testing.assert_array_equal(buckets, buckets_p)
