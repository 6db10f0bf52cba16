"""Chunking / embedding / RAG / CRUD operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.chunking import (
    chunk_chars_boundary,
    chunk_chars_fixed,
    chunk_sentences_fixed,
)
from python_vector_db___ai_spark.operators.crud import (
    collection_stats,
    delete_ids,
    get_by_ids,
    upsert,
)
from python_vector_db___ai_spark.operators.embedding import (
    embed_with_cache,
    mock_embedding,
)
from python_vector_db___ai_spark.operators.rag import (
    build_context,
    format_prompt,
)


def test_chunk_chars_fixed_reassembles(spark):
    text = "abcdefghij" * 30   # 300 chars
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_chars_fixed(df, size=100, overlap=20).collect(),
                  key=lambda r: r.chunk_id)
    # stride 80: starts 0,80,160,240
    assert [r.start_char for r in rows] == [0, 80, 160, 240]
    assert rows[0].chunk_text == text[:100]
    assert rows[-1].end_char == 300
    # consecutive chunks overlap by 20 chars
    assert rows[0].chunk_text[-20:] == rows[1].chunk_text[:20]


def test_chunk_chars_fixed_short_text_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], ["doc_id", "text"])
    rows = chunk_chars_fixed(df, size=100, overlap=20).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "tiny"


def test_chunk_sentences_windows(spark):
    text = " ".join(f"this is sentence number {i}." for i in range(12))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_sentences_fixed(df, max_sentences=5, overlap=1).collect(),
                  key=lambda r: r.chunk_id)
    # 12 sentences, window 5, stride 4 -> ceil((12-5)/4)+1 = 3 chunks
    assert len(rows) == 3
    assert rows[0].sentence_count == 5
    # overlap: last sentence of chunk 0 == first of chunk 1
    assert rows[0].chunk_text.split(" this is")[0] != ""


def test_chunk_boundary_cuts_at_period(spark):
    text = ("A" * 80 + ". ") * 5    # periods every 82 chars
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_chars_boundary(df, size=100, overlap=10, min_cut=50)
                  .collect(), key=lambda r: r.chunk_id)
    # every non-final chunk must end at a period boundary
    for r in rows[:-1]:
        assert r.chunk_text.endswith(".")
    # coverage: chunks tile the document
    assert rows[0].start_char == 0
    assert rows[-1].end_char == len(text)


def test_mock_embedding_deterministic_and_unit(spark):
    df = spark.createDataFrame([("hello",), ("hello",), ("world",)], ["text"])
    rows = df.select(mock_embedding(F.col("text")).alias("e")).collect()
    assert rows[0].e == rows[1].e
    assert rows[0].e != rows[2].e
    assert sum(x * x for x in rows[0].e) == pytest.approx(1.0, abs=1e-9)


def test_embed_with_cache_prefers_cached(spark):
    docs = spark.createDataFrame([(1, "aaa"), (2, "bbb")], ["doc_id", "text"])
    cached_vec = [1.0] + [0.0] * 7
    from python_vector_db___ai_spark.operators.embedding import cache_key
    cache = (spark.createDataFrame([("aaa",)], ["text"])
             .select(cache_key(F.col("text")).alias("key"),
                     F.lit(cached_vec).alias("embedding")))
    out = {r.doc_id: r for r in embed_with_cache(docs, cache).collect()}
    assert out[1].cache_hit and out[1].embedding == cached_vec
    assert not out[2].cache_hit


def test_build_context_budget(spark):
    rows = [("q1", 1, "x" * 100), ("q1", 2, "y" * 100), ("q1", 3, "z" * 100)]
    df = spark.createDataFrame(rows, ["query_id", "rank", "text"])
    got = build_context(df, max_length=210).collect()[0]
    # doc3 would need 100+2+100+2+100 = 304 > 210; docs 1-2 fit (202)
    assert got.n_docs == 2
    assert got.context == "x" * 100 + "\n\n" + "y" * 100
    assert got.context_chars == 202


def test_format_prompt_substitutes(spark):
    df = spark.createDataFrame([("ctx here", "q here")],
                               ["context", "question"])
    got = format_prompt(df).collect()[0].prompt
    assert "ctx here" in got and "q here" in got
    assert "{context}" not in got


def test_upsert_semantics(spark):
    base = spark.createDataFrame([(1, "old"), (2, "keep")], ["doc_id", "text"])
    updates = spark.createDataFrame([(1, "new"), (3, "ins")], ["doc_id", "text"])
    got = {r.doc_id: r.text for r in upsert(base, updates).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_delete_and_lookup(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(10)],
                               ["doc_id", "text"])
    remaining = delete_ids(df, [0, 5])
    assert remaining.count() == 8
    got = get_by_ids(df, [3, 7, 99]).collect()
    assert sorted(r.doc_id for r in got) == [3, 7]


def test_collection_stats(spark):
    df = spark.createDataFrame([(1, "aa"), (2, "bbbb")], ["doc_id", "text"])
    s = collection_stats(df).collect()[0]
    assert s.total_documents == 2 and s.unique_ids == 2
    assert s.avg_content_length == 3.0
    assert (s.min_content_length, s.max_content_length) == (2, 4)


def test_chunker_guards_and_empty_text(spark):
    """Sentence/token chunkers reject overlap >= window like the char
    chunker; empty text yields zero chunks (reference loop parity)."""
    import pytest as _pytest

    from python_vector_db___ai_spark.operators.chunking import (
        chunk_chars_fixed,
        chunk_sentences_fixed,
        chunk_tokens_fixed,
    )
    from python_vector_db___ai_spark.operators.crud import delete_ids

    df = spark.createDataFrame(
        [(1, ""), (2, "short text here")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_sentences_fixed(df, max_sentences=3, overlap=3)
    with _pytest.raises(ValueError):
        chunk_tokens_fixed(df, max_tokens=4, overlap=5)
    rows = chunk_chars_fixed(df, size=10, overlap=2).collect()
    assert {r.doc_id for r in rows} == {2}      # no empty chunk for ""
    # empty deletion list is a no-op, not a schema-inference crash
    assert delete_ids(df, []).count() == 2
