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
    n_chunks = F.when(
        F.length(text_col) <= size, F.lit(1)
    ).otherwise(
        F.ceil((F.length(text_col) - size).cast("double") / stride) + 1
    ).cast("int")
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * stride)
    # posexplode carries the text column along — no join, no shuffle:
    # the whole chunker is one narrow codegen'd stage.
    exploded = df.select(
        F.col(id_col), F.col(text_col),
        F.posexplode(starts).alias("chunk_id", "start_char"))
    return (exploded
            .select(
                id_col,
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.col("start_char").cast("long").alias("start_char"),
                F.least(F.col("start_char") + size, F.length(text_col))
                 .cast("long").alias("end_char"),
                F.expr(f"substr({text_col}, start_char + 1, {size})")
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
