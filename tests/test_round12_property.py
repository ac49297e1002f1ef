"""Round-12 property tests (hypothesis): the unigram-LM Viterbi DP
against brute-force segmentation enumeration, the badwords gate
against a pure-Python reference, and the alignment cosine against
numpy."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st


class TestViterbiProperty:
    """_viterbi_word must return the argmax-probability segmentation —
    checked against exhaustive enumeration of ALL segmentations for
    short words over a small alphabet."""

    @staticmethod
    def _all_segs(w, pieces, max_len):
        if not w:
            yield []
            return
        for ln in range(1, min(max_len, len(w)) + 1):
            head = w[:ln]
            if head in pieces:
                for rest in TestViterbiProperty._all_segs(
                    w[ln:], pieces, max_len
                ):
                    yield [head] + rest

    @given(
        w=st.text(alphabet="ab", min_size=1, max_size=7),
        extra=st.lists(
            st.text(alphabet="ab", min_size=2, max_size=3),
            max_size=4,
            unique=True,
        ),
        probs=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_viterbi_matches_bruteforce(self, w, extra, probs):
        from linz_bde_uploader_spark.functions.text import _viterbi_word

        import zlib

        pieces = {"a", "b"} | set(extra)
        # deterministic pseudo-probs keyed by a STABLE hash (Python's
        # hash() is salted per process — a recorded hypothesis failure
        # would not replay), strictly positive
        model = {
            p: round(0.05 + ((zlib.crc32(p.encode()) % 17) + 1) / 40.0, 6)
            for p in pieces
        }
        got = _viterbi_word(w, model, max_piece_len=3)
        got_score = math.prod(model[p] for p in got)
        best = max(
            (
                math.prod(model[p] for p in seg)
                for seg in self._all_segs(w, pieces, 3)
            ),
            default=None,
        )
        assert best is not None  # chars a,b present -> always segmentable
        # the DP's product must equal the true maximum exactly (same
        # multiplication order per piece count is not guaranteed, so
        # compare with a 1-ulp-scale tolerance)
        assert got_score >= best * (1 - 1e-12)

    def test_segmentation_reconstructs_word(self):
        from linz_bde_uploader_spark.functions.text import _viterbi_word

        model = {"a": 0.3, "b": 0.2, "ab": 0.4, "ba": 0.1}
        for w in ("a", "ab", "aba", "abab", "bbbb", "abba"):
            seg = _viterbi_word(w, model, 2)
            assert "".join(seg) == w

    def test_zero_prob_pieces_are_unreachable(self):
        # Regression (round-13 advice): a piece with prob exactly 0.0
        # used to win the DP (s = 0.0 beats the -1.0 init), returning a
        # zero-score multi-piece segmentation instead of the documented
        # whole-word fallback — quietly re-counting zero-count pieces
        # in the M-step. Zero-prob pieces must behave exactly like
        # absent pieces.
        from linz_bde_uploader_spark.functions.text import _viterbi_word

        # every covering piece has p = 0.0 -> no positive path -> the
        # whole-word fallback, NOT ["a", "b"] with score 0.0
        assert _viterbi_word("ab", {"a": 0.0, "b": 0.0}, 2) == ["ab"]
        # a zero-prob shortcut must not beat a positive char path
        assert _viterbi_word("ab", {"a": 0.5, "b": 0.5, "ab": 0.0}, 2) == [
            "a",
            "b",
        ]
        # zero-prob piece mid-word: only the positive path is returned
        assert _viterbi_word(
            "aba", {"a": 0.4, "b": 0.0, "ab": 0.3, "ba": 0.2}, 2
        ) == ["ab", "a"]


class TestBadwordsProperty:
    @given(
        toks=st.lists(
            st.sampled_from(["Dup", "dup", "ok", "fine", "SLOW", "slow"]),
            min_size=0,
            max_size=12,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_counts_match_python_reference(self, toks, spark):
        from linz_bde_uploader_spark.functions.text import badwords_gate

        text = " ".join(toks)
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        (r,) = badwords_gate(docs, ("dup", "slow")).collect()
        # reference on the SAME tokenization (single-space split)
        ref = [t.lower() for t in text.split(" ") if True]
        hits = [t for t in ref if t in ("dup", "slow")]
        assert r.n_hits == len(hits)
        assert r.n_distinct_hits == len(set(hits))
        assert r.keep == (len(hits) == 0)


class TestAlignmentProperty:
    @given(
        vec=st.lists(
            st.integers(min_value=-5, max_value=5), min_size=2, max_size=6
        ),
        vec2=st.lists(
            st.integers(min_value=-5, max_value=5), min_size=2, max_size=6
        ),
    )
    @settings(max_examples=25, deadline=None)
    def test_cosine_matches_numpy(self, vec, vec2, spark):
        import numpy as np

        from linz_bde_uploader_spark.functions.multimodal import (
            image_text_alignment,
        )

        n = min(len(vec), len(vec2))
        a, b = [float(x) for x in vec[:n]], [float(x) for x in vec2[:n]]
        docs = spark.createDataFrame(
            [(1, a, b)], "media_id long, img array<double>, txt array<double>"
        )
        (r,) = image_text_alignment(docs, "img", "txt").collect()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            assert r.align_score == -2.0 and r.keep is False
        else:
            want = float(np.dot(a, b) / (na * nb))
            assert abs(r.align_score - want) < 1e-6
            assert r.keep == (r.align_score >= 0.28)
