"""Embedding: deterministic hashing, unit-norm output, batch consistency."""

import numpy as np

from c99_vectordb_tpu.constants import DIM
from c99_vectordb_tpu.ops.embed import embed_text, embed_texts
from c99_vectordb_tpu.utils.hashing import fnv1a_64, token_features


class TestHashing:
    def test_fnv1a_known_vectors(self):
        # Empty input returns the FNV-1a 64-bit offset basis; the other two
        # are pinned regression values ((basis ^ byte) * prime mod 2^64 chain).
        assert fnv1a_64(b"") == 0xCBF29CE484B1A325
        assert fnv1a_64(b"a") == ((0xCBF29CE484B1A325 ^ 0x61) * 0x100000001B3) % (1 << 64)
        assert fnv1a_64(b"foobar") == 0xB020A278942CE7E8

    def test_deterministic_across_calls(self):
        b1, s1 = token_features("Hello World hello", DIM)
        b2, s2 = token_features("hello   world HELLO", DIM)  # case/ws-insensitive
        assert np.array_equal(b1, b2)
        assert np.array_equal(s1, s2)

    def test_token_multiplicity_retained(self):
        buckets, signs = token_features("dup dup unique", DIM)
        assert len(buckets) == 3


class TestEmbed:
    def test_unit_norm(self):
        vec = embed_text("the quick brown fox")
        assert vec.shape == (DIM,)
        assert vec.dtype == np.float32
        assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-5

    def test_blank_embeds_to_zero(self):
        assert np.all(embed_text("") == 0.0)
        assert np.all(embed_text("  \n ") == 0.0)
        assert np.all(embed_text("!!! ???") == 0.0)  # no word tokens

    def test_batch_matches_single(self):
        texts = ["alpha beta", "gamma delta epsilon", "", "alpha beta"]
        batch = embed_texts(texts)
        assert batch.shape == (4, DIM)
        for i, t in enumerate(texts):
            np.testing.assert_allclose(batch[i], embed_text(t), atol=1e-6)
        np.testing.assert_array_equal(batch[0], batch[3])

    def test_similar_texts_score_closer(self):
        a = embed_text("exercise fitness running health")
        b = embed_text("running exercise for health and fitness")
        c = embed_text("tax accounting quarterly filings")
        assert float(a @ b) > float(a @ c)

    def test_empty_batch(self):
        out = embed_texts([])
        assert out.shape == (0, DIM)
