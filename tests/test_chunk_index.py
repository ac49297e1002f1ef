"""Tests for context-window chunking and inverted-index build."""

from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.chunking import chunk_documents
from linz_bde_uploader_spark.functions.tfidf import inverted_index


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_stride_overlap_and_tail(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3: starts 0,3,6 cover
    # [0..3],[3..6],[6..9] — tail exactly consumed, no extra window
    text = " ".join(f"t{i}" for i in range(10))
    out = {r.chunk_id: (r.n_tokens, r.chunk)
           for r in chunk_documents(_docs(spark, [text]), chunk_tokens=4,
                                    overlap=1).collect()}
    assert out == {
        0: (4, "t0 t1 t2 t3"),
        1: (4, "t3 t4 t5 t6"),
        2: (4, "t6 t7 t8 t9"),
    }


def test_chunk_short_and_empty_docs(spark):
    out = chunk_documents(
        _docs(spark, ["one two", "", "   "]), chunk_tokens=5, overlap=2
    ).collect()
    assert len(out) == 1  # short doc -> one window; empty/blank -> none
    assert (out[0].doc_id, out[0].chunk_id, out[0].n_tokens,
            out[0].chunk) == (0, 0, 2, "one two")


def test_chunk_ragged_tail_window(spark):
    # 9 tokens, chunk 4, overlap 0: windows [0..3],[4..7],[8]
    text = " ".join(f"w{i}" for i in range(9))
    out = {r.chunk_id: r.n_tokens
           for r in chunk_documents(_docs(spark, [text]),
                                    chunk_tokens=4).collect()}
    assert out == {0: 4, 1: 4, 2: 1}


def test_chunk_every_token_covered_no_doc_crossing(spark):
    texts = [" ".join(f"d{d}t{i}" for i in range(n))
             for d, n in enumerate([1, 7, 30, 129])]
    chunks = chunk_documents(_docs(spark, texts), chunk_tokens=16,
                             overlap=4).collect()
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).extend(r.chunk.split(" "))
    for d, n in enumerate([1, 7, 30, 129]):
        toks = set(per_doc[d])
        assert toks == {f"d{d}t{i}" for i in range(n)}  # full coverage
        assert all(t.startswith(f"d{d}") for t in per_doc[d])  # no crossing


def test_chunk_validation(spark):
    import pytest

    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_inverted_index_postings_sorted_distinct_and_banded(spark):
    df = _docs(spark, [
        "apple banana apple",      # apple df counts doc once despite tf=2
        "banana cherry",
        "banana date",
    ])
    rows = {r.term: (r.df, r.postings)
            for r in inverted_index(df, min_df=1).collect()}
    assert rows["apple"] == (1, [0])
    assert rows["banana"] == (3, [0, 1, 2])
    assert rows["cherry"] == (1, [1])
    # min_df prunes singletons; max_df prunes stopword-dense terms
    pruned = {r.term for r in
              inverted_index(df, min_df=2, max_df=2).collect()}
    assert pruned == set()  # banana df=3 > max_df, rest df=1 < min_df
    only_common = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert only_common == {"banana"}
