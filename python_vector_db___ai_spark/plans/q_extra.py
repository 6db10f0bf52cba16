"""Coverage-completing queries: token/paragraph/hybrid/semantic
chunkers, the filtered-search lifecycle (SURVEY §3.1), day-5 euclidean
similarity with its global-max normalizer (A10), and chunk word
coverage (A8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.chunking import (
    chunk_chars_fixed,
    chunk_paragraphs,
    chunk_semantic,
    chunk_tokens_fixed,
)
from python_vector_db___ai_spark.operators.search import (
    apply_metadata_filter,
    search,
)
from python_vector_db___ai_spark.plans.q_vector import _cos_sql
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_MT, _TOVL = 40, 10          # small enough that the word-soup docs multi-chunk
_TSTRIDE = _MT - _TOVL


@register(
    "chunk_tokens_fixed",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS toks
  FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS nt,
         CASE WHEN len(toks) <= 0 THEN 0
              WHEN len(toks) <= {_MT} THEN 1
              ELSE CAST(ceil((len(toks) - {_MT}) * 1.0 / {_TSTRIDE}) AS INT) + 1
         END AS n_chunks
  FROM t WHERE len(toks) > 0
), e AS (
  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
       array_to_string(toks[chunk_id * {_TSTRIDE} + 1
                             : chunk_id * {_TSTRIDE} + {_MT}], ' ') AS chunk_text,
       len(toks[chunk_id * {_TSTRIDE} + 1
                 : chunk_id * {_TSTRIDE} + {_MT}])::BIGINT AS token_count,
       (chunk_id * {_TSTRIDE})::BIGINT AS start_token
FROM e
""",
    doc="F11 token-window chunking (max 40 tokens, overlap 10) — pure "
        "expressions, whitespace tokens",
)
def q_chunk_tokens_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_tokens_fixed(docs, max_tokens=_MT, overlap=_TOVL)


@register(
    "chunk_paragraphs",
    oracle="""
WITH p AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '\\n\\n+'),
                                    x -> trim(x)),
                     x -> length(x) >= 50) AS paras
  FROM documents
), n AS (
  SELECT doc_id, paras,
         CAST(ceil(len(paras) * 1.0 / 3) AS INT) AS n_chunks
  FROM p WHERE len(paras) > 0
), e AS (
  SELECT doc_id, paras, unnest(range(0, n_chunks)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
       array_to_string(paras[chunk_id * 3 + 1 : chunk_id * 3 + 3],
                       chr(10) || chr(10)) AS chunk_text,
       len(paras[chunk_id * 3 + 1 : chunk_id * 3 + 3])::BIGINT AS paragraph_count
FROM e
""",
    doc="F13 paragraph chunking (blank-line split, max 3, min 50 chars)",
)
def q_chunk_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_paragraphs(docs, max_paragraphs=3)


_SEM_THRESHOLD = 0.7


def _chunk_semantic_oracle() -> str:
    """Replay the greedy seed-and-grow scan as a recursive CTE (the
    same trick chunk_chars_boundary uses for the day-15 boundary
    scan): each recursion step picks the smallest unused sentence
    index as seed, grows its group by mock-embedding cosine >= t over
    the unused tail, and appends the group to the used list.  The
    mock embedder is md5-derived integer math, so DuckDB reproduces
    the vectors (and the greedy decisions) bit-for-bit."""
    from python_vector_db___ai_spark.operators.embedding import (
        mock_embedding_sql,
    )

    mock = mock_embedding_sql("sent", dim=8)
    return f"""
WITH RECURSIVE
sent0 AS (
  SELECT doc_id, idx, trim(part, ' ' || chr(9) || chr(10) || chr(13)) AS sent
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]\\s+')) AS part,
           generate_subscripts(regexp_split_to_array(text, '[.!?]\\s+'), 1) AS idx
    FROM documents
  )
), sent AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS i,
         sent
  FROM sent0 WHERE length(sent) >= 10
), vec AS (
  SELECT doc_id, i, {mock} AS v FROM sent
), pack AS (
  SELECT s.doc_id,
         list(s.sent ORDER BY s.i) AS sents,
         list(v.v ORDER BY v.i) AS vecs,
         count(*) AS n
  FROM sent s JOIN vec v ON v.doc_id = s.doc_id AND v.i = s.i
  GROUP BY s.doc_id
), rec AS (
  SELECT doc_id, sents, vecs, n,
         CAST(-1 AS BIGINT) AS cid,
         []::BIGINT[] AS used,
         CAST(NULL AS VARCHAR) AS chunk_text,
         CAST(0 AS BIGINT) AS n_sentences
  FROM pack
  UNION ALL
  SELECT doc_id, sents, vecs, n, cid + 1,
         used || grp,
         array_to_string(list_transform(grp, g -> sents[g + 1]), ' '),
         len(grp)::BIGINT
  FROM (
    SELECT doc_id, sents, vecs, n, cid, used,
           [seed] || list_filter(range(seed + 1, n),
                                 j -> NOT list_contains(used, j)
                                      AND list_dot_product(vecs[seed + 1],
                                                           vecs[j + 1])
                                          >= {_SEM_THRESHOLD}) AS grp
    FROM (
      SELECT *, list_min(list_filter(range(0, n),
                                     x -> NOT list_contains(used, x))) AS seed
      FROM rec
      WHERE len(used) < n
    )
  )
)
SELECT doc_id, cid AS chunk_id, chunk_text, n_sentences
FROM rec WHERE cid >= 0
"""


@register(
    "chunk_semantic",
    oracle=_chunk_semantic_oracle(),
    doc="F14 greedy semantic sentence grouping (cosine >= 0.7, mock "
        "embeddings, sequential per doc / parallel across docs) — "
        "greedy scan replayed by a recursive-CTE oracle",
)
def q_chunk_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_semantic(docs, threshold=_SEM_THRESHOLD)


@register(
    "search_filtered",
    oracle=f"""
WITH corpus AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS cv, d.lang, d.source
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
)
SELECT c.vec_id, c.lang,
       round({_cos_sql('q.qv', 'c.cv')}, 6) AS score
FROM corpus c CROSS JOIN q
WHERE c.lang = 'en'
ORDER BY score DESC, c.vec_id ASC
LIMIT 10
""",
    doc="§3.1 search lifecycle: metadata map filter (P3) -> cosine -> "
        "TakeOrderedAndProject; filter pushes below the scoring",
)
def q_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    corpus = (emb.join(docs.select(F.col("doc_id").alias("vec_id"),
                                   "lang", "source"), "vec_id")
              .withColumn("metadata",
                          F.create_map(F.lit("lang"), F.col("lang"),
                                       F.lit("source"), F.col("source"))))
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    filtered = apply_metadata_filter(corpus, {"lang": "en"})
    hits = search(filtered, qvec, k=10, metric="cosine", corpus_id="vec_id")
    return hits.select("vec_id", "lang", F.round("score", 6).alias("score"))


# NB: the day-5 global-max-normalized euclidean-similarity pairs (V4 /
# A10) merged into q_vector.topk_similar_pairs as its 'euclidean_sim'
# branch — one driver check covers both pair metrics.


@register(
    "chunk_word_coverage",
    oracle="""
WITH chunks AS (
  SELECT doc_id,
         CAST(floor((i - 1) / 150) AS BIGINT) AS chunk_id,
         substr(text, i, 200) AS chunk_text, text
  FROM documents,
       unnest(list_transform(
         range(0, CASE WHEN length(text) <= 0 THEN 0
                       WHEN length(text) <= 200 THEN 1
                       ELSE CAST(ceil((length(text) - 200) / 150.0) AS INT) + 1
                  END),
         k -> k * 150 + 1)) AS u(i)
), cov AS (
  SELECT doc_id, chunk_id,
         list_distinct(list_filter(regexp_split_to_array(lower(chunk_text),
                                                         '\\s+'),
                                   w -> w <> '')) AS cw,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   w -> w <> '')) AS dw
  FROM chunks
)
SELECT doc_id, chunk_id,
       round(len(list_intersect(cw, dw)) * 1.0 / len(dw), 6) AS word_coverage
FROM cov WHERE len(dw) > 0
""",
    doc="A8 chunk-vs-source word coverage ratio "
        "(day_10/utils/evaluation.py:152-160)",
)
def q_chunk_word_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_chars_fixed(docs, size=200, overlap=50)
    joined = chunks.join(docs.select("doc_id", "text"), "doc_id")
    def wordset(c):
        return F.array_distinct(
            F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != ""))
    cw, dw = wordset(F.col("chunk_text")), wordset(F.col("text"))
    return (joined
            .select("doc_id", "chunk_id",
                    F.round(F.size(F.array_intersect(cw, dw))
                            / F.size(dw), 6).alias("word_coverage"))
            .filter(F.size(dw) > 0))
