"""Chunking → embedding → RAG pipeline queries (SURVEY §3.3 lifecycle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import md5_hex
from python_vector_db___ai_spark.operators.chunking import (
    chunk_chars_boundary,
    chunk_chars_fixed,
    chunk_sentences_fixed,
    chunk_stats,
)
from python_vector_db___ai_spark.operators.embedding import (
    embed_with_cache,
    mock_embedding,
    mock_embedding_sql,
)
from python_vector_db___ai_spark.operators.rag import (
    build_context,
    format_prompt,
    mock_answer,
)
from python_vector_db___ai_spark.operators.search import knn_join
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_SIZE, _OVL = 200, 50
_STRIDE = _SIZE - _OVL

_CHUNK_CTE = f"""
WITH n AS (
  SELECT doc_id, text, length(text) AS len,
         CASE WHEN length(text) <= 0 THEN 0
              WHEN length(text) <= {_SIZE} THEN 1
              ELSE CAST(ceil((length(text) - {_SIZE}) * 1.0 / {_STRIDE}) AS INT) + 1
         END AS n_chunks
  FROM documents
), c AS (
  SELECT doc_id,
         unnest(range(0, n_chunks)) AS chunk_id,
         unnest(list_transform(range(0, n_chunks), i -> i * {_STRIDE})) AS start_char,
         text, len
  FROM n
), chunks AS (
  SELECT doc_id, chunk_id::BIGINT AS chunk_id, start_char::BIGINT AS start_char,
         least(start_char + {_SIZE}, len)::BIGINT AS end_char,
         substr(text, start_char + 1, {_SIZE}) AS chunk_text
  FROM c
)
"""


@register(
    "chunk_chars_fixed",
    oracle=_CHUNK_CTE + """
SELECT doc_id, chunk_id, start_char, end_char, chunk_text,
       length(chunk_text)::BIGINT AS chunk_chars
FROM chunks
""",
    doc="F16 char-window chunking (fixed stride), pure expressions + posexplode",
)
def q_chunk_chars_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_chars_fixed(docs, size=_SIZE, overlap=_OVL)


# Unregistered in round 7: A4 chunk statistics are now the 'chunks'
# branch of q_olap's melted ``data_health_report`` (registry
# consolidation, round-6 VERDICT #1).
CHUNK_STATS_ORACLE = _CHUNK_CTE + """
SELECT count(*)::BIGINT AS total_chunks,
       count(DISTINCT doc_id)::BIGINT AS n_documents,
       round(avg(length(chunk_text)), 6) AS avg_chunk_chars,
       min(length(chunk_text))::BIGINT AS min_chunk_chars,
       max(length(chunk_text))::BIGINT AS max_chunk_chars,
       sum(length(chunk_text))::BIGINT AS total_chars
FROM chunks
"""


def q_chunk_stats_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 chunk statistics over the char chunker output."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_stats(chunk_chars_fixed(docs, size=_SIZE, overlap=_OVL))


_MAXS, _SOVL = 5, 1
_SSTRIDE = _MAXS - _SOVL


@register(
    "chunk_sentences_fixed",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]\\s+'),
                                    x -> trim(x)),
                     x -> length(x) >= 10) AS sents
  FROM documents
), n AS (
  SELECT doc_id, sents, len(sents) AS ns,
         CASE WHEN len(sents) <= 0 THEN 0
              WHEN len(sents) <= {_MAXS} THEN 1
              ELSE CAST(ceil((len(sents) - {_MAXS}) * 1.0 / {_SSTRIDE}) AS INT) + 1
         END AS n_chunks
  FROM s WHERE len(sents) > 0
), e AS (
  SELECT doc_id, sents,
         unnest(range(0, n_chunks)) AS chunk_id
  FROM n
), c AS (
  SELECT doc_id, chunk_id::BIGINT AS chunk_id,
         sents[chunk_id * {_SSTRIDE} + 1 : chunk_id * {_SSTRIDE} + {_MAXS}] AS cs
  FROM e
)
SELECT doc_id, chunk_id,
       array_to_string(cs, ' ') AS chunk_text,
       len(cs)::BIGINT AS sentence_count,
       len(list_filter(regexp_split_to_array(array_to_string(cs, ' '), '\\s+'),
                       w -> w <> ''))::BIGINT AS word_count
FROM c
""",
    doc="F12 sentence-window chunking (5 sentences, overlap 1, min 10 chars)",
)
def q_chunk_sentences_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_sentences_fixed(docs, max_sentences=_MAXS, overlap=_SOVL)


_MINCUT = 100

# Recursive-CTE oracle for the sequential day_15 boundary chunker.
# One window per recursion step: end0 = min(start+size, len); if a
# '. ' exists in the window whose cut position exceeds min_cut, cut
# there; next start = max(end - overlap, start + 1).  `cutrel` is the
# 0-based offset of the LAST '. ' in the segment (rfind), found via
# strpos on the reversed segment.
_BOUNDARY_STEP = f"""
      SELECT doc_id, text, n, chunk_id, start_pos,
             CASE WHEN least(start_pos + {_SIZE}, n) < n
                       AND cutrel IS NOT NULL AND cutrel + 1 > {_MINCUT}
                  THEN start_pos + cutrel + 1
                  ELSE least(start_pos + {_SIZE}, n) END AS end_pos
      FROM (
        SELECT *,
               CASE WHEN strpos(reverse(substr(text, start_pos + 1, {_SIZE})),
                                ' .') > 0
                    THEN length(substr(text, start_pos + 1, {_SIZE}))
                         - strpos(reverse(substr(text, start_pos + 1, {_SIZE})),
                                  ' .') - 1
                    ELSE NULL END AS cutrel
        FROM {{src}}
      )
"""


@register(
    "chunk_chars_boundary",
    oracle=f"""
WITH RECURSIVE ch AS (
  SELECT doc_id, text, length(text) AS n,
         0::BIGINT AS chunk_id, 0::BIGINT AS start_pos
  FROM documents WHERE length(text) > 0
  UNION ALL
  SELECT doc_id, text, n, chunk_id + 1,
         greatest(end_pos - {_OVL}, start_pos + 1) AS start_pos
  FROM ({_BOUNDARY_STEP.format(src='ch')})
  WHERE end_pos < n
), stepped AS (
  {_BOUNDARY_STEP.format(src='ch')}
)
SELECT doc_id, chunk_id, start_pos::BIGINT AS start_char,
       end_pos::BIGINT AS end_char,
       substr(text, start_pos + 1, (end_pos - start_pos)::INT) AS chunk_text
FROM stepped
""",
    doc="F16 faithful day_15 boundary-aware chunker (pandas UDF + explode "
        "on the Spark side; a recursive CTE replays the sequential "
        "cut-at-'. ' scan in the oracle)",
)
def q_chunk_chars_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_chars_boundary(docs, size=_SIZE, overlap=_OVL,
                                min_cut=_MINCUT)


_CACHE_N = 250


@register(
    "embed_cache_hits",
    oracle=f"""
WITH cache AS (
  SELECT md5(concat('mock:', text)) AS key FROM documents
  WHERE doc_id < {_CACHE_N}
), emb AS (
  SELECT d.doc_id, d.text, {mock_embedding_sql('d.text')} AS e
  FROM documents d
)
SELECT emb.doc_id,
       (c.key IS NOT NULL) AS cache_hit,
       round(sqrt(list_dot_product(e, e)), 6) AS emb_norm,
       round(e[1], 6) AS e0, round(e[2], 6) AS e1,
       round(e[3], 6) AS e2, round(e[4], 6) AS e3
FROM emb
LEFT JOIN cache c ON md5(concat('mock:', emb.text)) = c.key
""",
    doc="V7 deterministic mock embedder (md5-derived, L2-normalized — the "
        "hermetic SentenceTransformer stand-in) through the S12/J3 cache "
        "join: hits reuse, misses embed; norm + leading components "
        "checked per doc",
)
def q_embed_cache_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.functions.vector import vec_norm

    docs = load_table(spark, sf_dir, "documents")
    cache = (docs.filter(F.col("doc_id") < _CACHE_N)
             .select(md5_hex(F.concat(F.lit("mock:"), F.col("text")))
                     .alias("key"),
                     mock_embedding(F.col("text")).alias("embedding")))
    out = embed_with_cache(docs, cache)
    return out.select(
        "doc_id", "cache_hit",
        F.round(vec_norm(F.col("embedding")), 6).alias("emb_norm"),
        *[F.round(F.col("embedding")[i], 6).alias(f"e{i}") for i in range(4)])


_RAG_QUERIES = 5
_RAG_K = 3
_RAG_BUDGET = 600

_RAG_CTE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_RAG_QUERIES}
), ranked AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) > 1e-12
                                  AND sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) > 1e-12
                            THEN list_dot_product(q.qv, e.embedding::DOUBLE[])
                                 / (sqrt(list_dot_product(q.qv, q.qv))
                                    * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
                            ELSE 0.0 END, 6) DESC,
                      e.vec_id ASC) AS rank
    FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_RAG_K}
), with_text AS (
  SELECT r.query_id, r.rank, d.text
  FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
), budgeted AS (
  SELECT query_id, rank, text,
         sum(length(text) + 2) OVER (PARTITION BY query_id ORDER BY rank
                                     ROWS UNBOUNDED PRECEDING) - 2 AS cum
  FROM with_text
), kept AS (
  SELECT * FROM budgeted WHERE cum <= {_RAG_BUDGET}
), ctx AS (
  SELECT query_id,
         string_agg(text, chr(10) || chr(10) ORDER BY rank) AS context,
         count(*)::BIGINT AS n_docs,
         max(cum)::BIGINT AS context_chars
  FROM kept GROUP BY query_id
)
"""


def _rag_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = (emb.filter(F.col("vec_id") < _RAG_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    hits = knn_join(queries, emb, k=_RAG_K, metric="cosine",
                    corpus_id="vec_id", exclude_self=True)
    return (hits.join(docs.select(F.col("doc_id").alias("vec_id"), "text"),
                      "vec_id")
            .select("query_id", "rank", "text"))


@register(
    "rag_end_to_end",
    oracle=_RAG_CTE + """
, qa AS (
  SELECT c.query_id, c.context, c.n_docs, c.context_chars,
         concat('what is ', substr(d.text, 1, 30), '?') AS question
  FROM ctx c JOIN documents d ON d.doc_id = c.query_id
)
SELECT query_id, n_docs, context_chars, md5(context) AS context_hash,
       md5(concat('Answer the question based on the context below.',
                  chr(10), chr(10), 'Context:', chr(10), context,
                  chr(10), chr(10), 'Question: ', question,
                  chr(10), chr(10), 'Answer:')) AS prompt_hash,
       concat('Based on the context: ', substr(context, 1, 200)) AS answer
FROM qa
""",
    doc="the day_12 RAG flagship end-to-end: F19 context building "
        "(rank-ordered concat under a 600-char budget) -> F20 prompt "
        "templating -> F21 rule-based mock answer, all in one checked "
        "row per query",
)
def q_rag_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ctx = build_context(_rag_ranked(spark, sf_dir), max_length=_RAG_BUDGET)
    qa = (ctx.join(docs.select(F.col("doc_id").alias("query_id"), "text"),
                   "query_id")
          .withColumn("question",
                      F.concat(F.lit("what is "),
                               F.substring("text", 1, 30), F.lit("?"))))
    out = format_prompt(qa)
    return out.select(
        "query_id", "n_docs", "context_chars",
        md5_hex(F.col("context")).alias("context_hash"),
        md5_hex(F.col("prompt")).alias("prompt_hash"),
        mock_answer(F.col("question"), F.col("context")).alias("answer"))
