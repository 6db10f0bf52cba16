"""Chunking operators (SURVEY §2.11 F11-F17, day_10 chunkers + day_15
char chunker).

Two execution tiers:

* **Fixed-stride chunkers** (char window, sentence window) — pure
  ``sequence`` + ``slice``/``substr`` + ``posexplode`` expressions.
  These are the 100-TB hot path: whole-stage codegen, zero Python, and
  they're exactly reproducible in the DuckDB oracle.
* **Boundary-aware char chunker** — the reference's stateful algorithm
  (day_15/main.py:81-102: cut at the last ``'. '`` before the window
  end, next window starts at ``cut - overlap``) is inherently
  sequential per document, so it ships as an Arrow-batched pandas UDF
  returning an array of chunk structs + ``posexplode`` (the
  UDF-as-UDTF pattern, SURVEY §2.12).  Parallelism is across
  documents — which is the only axis that matters at scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fixed-stride char windows (pure expressions)


def chunk_chars_fixed(df: DataFrame, size: int = 1000, overlap: int = 200,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Character windows of ``size`` chars advancing by ``size-overlap``
    (day_15/main.py:81 parameters, minus the sequential boundary repair).

    Output: ``(id_col, chunk_id, start_char, end_char, chunk_text,
    chunk_chars)`` with 0-based ``start_char`` and exclusive
    ``end_char``.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    # length 0 -> no chunks (the reference's `while start < n` loop
    # emits nothing for an empty text; the boundary chunker agrees)
    n_chunks = F.when(
        F.length(text_col) <= 0, F.lit(0)
    ).when(
        F.length(text_col) <= size, F.lit(1)
    ).otherwise(
        F.ceil((F.length(text_col) - size).cast("double") / stride) + 1
    ).cast("int")
    starts = F.transform(F.sequence(F.lit(0), F.greatest(n_chunks - 1,
                                                         F.lit(0))),
                         lambda i: i * stride)
    # posexplode carries the text column along — no join, no shuffle:
    # the whole chunker is one narrow codegen'd stage.
    exploded = df.filter(F.length(text_col) > 0).select(
        F.col(id_col), F.col(text_col),
        F.posexplode(starts).alias("chunk_id", "start_char"))
    return (exploded
            .select(
                id_col,
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.col("start_char").cast("long").alias("start_char"),
                F.least(F.col("start_char") + size, F.length(text_col))
                 .cast("long").alias("end_char"),
                F.col(text_col).substr(F.col("start_char") + 1, F.lit(size))
                 .alias("chunk_text"))
            .withColumn("chunk_chars", F.length("chunk_text").cast("long")))


def chunk_sentences_fixed(df: DataFrame, max_sentences: int = 5,
                          overlap: int = 1, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_sentence_chars: int = 10) -> DataFrame:
    """Sentence windows: split on sentence-ending punctuation, group
    ``max_sentences`` per chunk with ``overlap`` shared sentences
    (day_10/chunkers/sentence_chunker.py:140-234 defaults; regex
    fallback path, no NLTK).

    The split pattern ``[.!?]\\s+`` is lookbehind-free so the DuckDB
    oracle reproduces it; sentences under ``min_sentence_chars`` are
    dropped (P9).
    """
    if overlap >= max_sentences:
        raise ValueError("overlap must be < max_sentences")
    stride = max_sentences - overlap
    sents = F.filter(
        F.transform(F.split(F.col(text_col), r"[.!?]\s+"), lambda s: F.trim(s)),
        lambda s: F.length(s) >= min_sentence_chars)
    with_sents = df.select(F.col(id_col), sents.alias("sents"))
    n = F.size("sents")
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= max_sentences, F.lit(1)) \
        .otherwise(F.ceil((n - max_sentences).cast("double") / stride) + 1) \
        .cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    exploded = (with_sents.filter(n > 0)
                .select(id_col, "sents", F.posexplode(idx).alias("chunk_id", "i")))
    chunk_sents = F.slice(F.col("sents"), F.col("i") * stride + 1, max_sentences)
    return (exploded
            .filter(F.col("chunk_id") < n_chunks)
            .select(
                id_col,
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.concat_ws(" ", chunk_sents).alias("chunk_text"),
                F.size(chunk_sents).cast("long").alias("sentence_count"))
            .withColumn("word_count",
                        F.size(F.filter(F.split(F.col("chunk_text"), r"\s+"),
                                        lambda w: w != "")).cast("long")))


# ---------------------------------------------------------------------------
# Boundary-aware char chunker (pandas UDF, faithful to day_15)

_CHUNK_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("chunk_id", T.LongType()),
    T.StructField("start_char", T.LongType()),
    T.StructField("end_char", T.LongType()),
    T.StructField("chunk_text", T.StringType()),
]))


def _boundary_chunks(text: str, size: int, overlap: int,
                     min_cut: int) -> list[tuple[int, int, int, str]]:
    # Sequential scan per document (day_15/main.py:81-102 semantics):
    # cut each window at the last '. ' past min_cut, next window starts
    # overlap chars before the cut.
    out = []
    start, cid = 0, 0
    n = len(text)
    while start < n:
        end = min(start + size, n)
        seg = text[start:end]
        if end < n:
            cut = seg.rfind(". ")
            if cut != -1 and cut + 1 > min_cut:
                end = start + cut + 1
                seg = text[start:end]
        out.append((cid, start, end, seg))
        if end >= n:
            break
        start = max(end - overlap, start + 1)
        cid += 1
    return out


def chunk_chars_boundary(df: DataFrame, size: int = 1000, overlap: int = 200,
                         min_cut: int = 500, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Period-boundary char chunking, the reference's exact algorithm.
    One pandas-UDF call per Arrow batch; explodes to one row per chunk."""

    @F.pandas_udf(_CHUNK_SCHEMA)
    def chunker(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield batch.map(
                lambda t: _boundary_chunks(t or "", size, overlap, min_cut))

    return (df
            .select(F.col(id_col), F.explode(chunker(F.col(text_col))).alias("c"))
            .select(id_col, F.col("c.chunk_id"), F.col("c.start_char"),
                    F.col("c.end_char"), F.col("c.chunk_text")))


def chunk_tokens_fixed(df: DataFrame, max_tokens: int = 1000,
                       overlap: int = 100, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """F11 token-window chunking (day_10/chunkers/token_chunker.py:60-176
    defaults: 1000 tokens, 100 overlap), whitespace tokens, pure
    expressions.  Chunk text is the tokens re-joined with single spaces
    (original inter-token whitespace is not preserved — the reference
    reconstructs from tokens too)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    with_ws = df.select(F.col(id_col), ws.alias("toks"))
    n = F.size("toks")
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= max_tokens, F.lit(1)) \
        .otherwise(F.ceil((n - max_tokens).cast("double") / stride) + 1) \
        .cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    exploded = (with_ws.filter(n > 0)
                .select(id_col, "toks", n_chunks.alias("_nc"),
                        F.posexplode(idx).alias("chunk_id", "_i")))
    toks = F.slice(F.col("toks"), F.col("_i") * stride + 1, max_tokens)
    return (exploded.filter(F.col("chunk_id") < F.col("_nc"))
            .select(id_col,
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.concat_ws(" ", toks).alias("chunk_text"),
                    F.size(toks).cast("long").alias("token_count"),
                    (F.col("_i") * stride).cast("long").alias("start_token")))


def chunk_paragraphs(df: DataFrame, max_paragraphs: int = 3,
                     text_col: str = "text", id_col: str = "doc_id",
                     min_paragraph_chars: int = 50) -> DataFrame:
    """F13 paragraph chunking (day_10/chunkers/sentence_chunker.py:364-433):
    split on blank lines, drop short paragraphs (P9), group
    ``max_paragraphs`` per chunk (no overlap)."""
    paras = F.filter(
        F.transform(F.split(F.col(text_col), r"\n\n+"), lambda p: F.trim(p)),
        lambda p: F.length(p) >= min_paragraph_chars)
    with_p = df.select(F.col(id_col), paras.alias("paras"))
    n = F.size("paras")
    n_chunks = F.ceil(n.cast("double") / max_paragraphs).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    exploded = (with_p.filter(n > 0)
                .select(id_col, "paras", n_chunks.alias("_nc"),
                        F.posexplode(idx).alias("chunk_id", "_i")))
    chunk_paras = F.slice(F.col("paras"),
                          F.col("_i") * max_paragraphs + 1, max_paragraphs)
    return (exploded.filter(F.col("chunk_id") < F.col("_nc"))
            .select(id_col,
                    F.col("chunk_id").cast("long").alias("chunk_id"),
                    F.concat_ws("\n\n", chunk_paras).alias("chunk_text"),
                    F.size(chunk_paras).cast("long").alias("paragraph_count")))


def detect_content_type(text) -> "Column":
    """F8 content-type detection (day_10/chunkers/hybrid_chunker.py:27-90):
    regex-bank cascade -> code / table / list / header / prose."""
    return (F.when(text.contains("```")
                   | text.rlike(r"(?m)^(def |class |import |from \w+ import)"),
                   "code")
            .when(text.rlike(r"(?m)^\|.*\|"), "table")
            .when(text.rlike(r"(?m)^\s*[-*+] "), "list")
            .when(text.rlike(r"(?m)^#{1,6} "), "header")
            .otherwise("prose"))


def chunk_hybrid(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", **kwargs) -> DataFrame:
    """F15 hybrid dispatch (day_10/chunkers/hybrid_chunker.py:136-199):
    detect content type, route code/tables to paragraph-preserving
    chunking and prose to sentence windows; output records the
    strategy.  Union of two filtered branches — each branch stays a
    narrow pipeline, so the dispatch costs one extra scan, not a
    shuffle."""
    typed = df.withColumn("_ct", detect_content_type(F.col(text_col)))
    structured = typed.filter(F.col("_ct").isin("code", "table"))
    prose = typed.filter(~F.col("_ct").isin("code", "table"))
    a = (chunk_paragraphs(structured, text_col=text_col, id_col=id_col,
                          min_paragraph_chars=1)
         .withColumn("strategy", F.lit("paragraph"))
         .select(id_col, "chunk_id", "chunk_text", "strategy"))
    b = (chunk_sentences_fixed(prose, text_col=text_col, id_col=id_col,
                               **kwargs)
         .withColumn("strategy", F.lit("sentence"))
         .select(id_col, "chunk_id", "chunk_text", "strategy"))
    return a.unionByName(b)


_SEM_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("chunk_id", T.LongType()),
    T.StructField("chunk_text", T.StringType()),
    T.StructField("n_sentences", T.LongType()),
]))


def chunk_semantic(df: DataFrame, threshold: float = 0.7,
                   text_col: str = "text", id_col: str = "doc_id",
                   dim: int | None = None) -> DataFrame:
    """F14 semantic sentence grouping
    (day_10/chunkers/sentence_chunker.py:257-362): greedy seed-and-grow
    clustering of sentences by embedding cosine >= threshold.

    Greedy and stateful => sequential per document (SURVEY §7 hard
    parts), so it runs inside a pandas UDF with the deterministic mock
    embedder (the shared ``mock_embedding_py``, so the vectors are
    exactly the engine's mock embeddings); parallelism is across
    documents.  ``dim`` defaults to ``embedding.MOCK_DIM``.
    """
    import numpy as np

    from python_vector_db___ai_spark.operators.embedding import (
        MOCK_DIM,
        mock_embedding_py,
    )

    if dim is None:
        dim = MOCK_DIM

    def _mock_vec(s: str) -> "np.ndarray":
        return mock_embedding_py(s, dim=dim)

    def _group(text: str) -> list[tuple[int, str, int]]:
        import re

        sents = [s.strip() for s in re.split(r"[.!?]\s+", text or "")
                 if len(s.strip()) >= 10]
        if not sents:
            return []
        vecs = np.array([_mock_vec(s) for s in sents])
        used = [False] * len(sents)
        chunks = []
        cid = 0
        for i in range(len(sents)):
            if used[i]:
                continue
            group = [i]
            used[i] = True
            for j in range(i + 1, len(sents)):
                if not used[j] and float(vecs[i] @ vecs[j]) >= threshold:
                    group.append(j)
                    used[j] = True
            chunks.append((cid, " ".join(sents[g] for g in group), len(group)))
            cid += 1
        return chunks

    @F.pandas_udf(_SEM_SCHEMA)
    def grouper(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            yield batch.map(_group)

    return (df.select(F.col(id_col),
                      F.explode(grouper(F.col(text_col))).alias("c"))
            .select(id_col, F.col("c.chunk_id"), F.col("c.chunk_text"),
                    F.col("c.n_sentences")))


def chunk_stats(chunks: DataFrame, id_col: str = "doc_id",
                text_col: str = "chunk_text") -> DataFrame:
    """A4 chunk statistics (day_10/chunkers/token_chunker.py:178-194):
    totals and min/avg/max of chunk sizes, one row."""
    sized = chunks.withColumn("_n", F.length(text_col))
    return sized.agg(
        F.count("*").cast("long").alias("total_chunks"),
        F.countDistinct(id_col).cast("long").alias("n_documents"),
        F.round(F.avg("_n"), 6).alias("avg_chunk_chars"),
        F.min("_n").cast("long").alias("min_chunk_chars"),
        F.max("_n").cast("long").alias("max_chunk_chars"),
        F.sum("_n").cast("long").alias("total_chars"))
