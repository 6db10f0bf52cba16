"""Vector-search queries over the ``embeddings`` table (SURVEY §2.3/2.4/2.7).

Corpus: ``embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)``.
Queries are the first ``N_QUERIES`` corpus vectors (deterministic), which
mirrors the reference's perturbed-corpus query strategy
(day_6/day6_complete.py:54-63) while staying oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.vector import (
    l2_normalize,
    vec_norm,
)
from python_vector_db___ai_spark.operators.search import (
    knn_join,
    knn_join_blas,
    topk_pairs,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

N_QUERIES = 20
K = 10

# DuckDB fragments — double-precision vector math matching functions/vector.py
_DD = "list_dot_product({a}, {b})"
_DNORM = "sqrt(list_dot_product({a}, {a}))"


def _cos_sql(a: str, b: str) -> str:
    na = _DNORM.format(a=a)
    nb = _DNORM.format(a=b)
    dot = _DD.format(a=a, b=b)
    return (f"(CASE WHEN {na} > 1e-12 AND {nb} > 1e-12 "
            f"THEN {dot} / ({na} * {nb}) ELSE 0.0 END)")


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))


@register(
    "knn_exact_cosine",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id,
         round({_cos_sql('qv', 'cv')}, 6) AS score
  FROM q CROSS JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
""",
    doc="J1/T2 exact flat kNN, cosine (day_6/day6_complete.py:86-99)",
)
def knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_blas(_queries_df(spark, sf_dir), emb, k=K,
                         metric="cosine", corpus_id="vec_id")


@register(
    "knn_exact_l2",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_distance(qv, cv), 6) AS score
  FROM q CROSS JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score ASC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
""",
    doc="exact kNN under L2 distance, pgvector <-> (day_9/database/vector_ops.py:143-147)",
)
def knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_blas(_queries_df(spark, sf_dir), emb, k=K, metric="l2",
                         corpus_id="vec_id")


@register(
    "knn_exact_dot",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id, round(list_dot_product(qv, cv), 6) AS score
  FROM q CROSS JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {K}
""",
    doc="exact kNN under inner product, pgvector <#> (V5)",
)
def knn_exact_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(_queries_df(spark, sf_dir), emb, k=K, metric="inner_product",
                    corpus_id="vec_id")


_PAIRS_N = 200
_PAIRS_K = 20


@register(
    "topk_similar_pairs",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev
  FROM embeddings WHERE vec_id < {_PAIRS_N}
), pairs AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         round({_cos_sql('a.ev', 'b.ev')}, 6) AS score
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT i, j, score FROM pairs
ORDER BY score DESC, i ASC, j ASC LIMIT {_PAIRS_K}
""",
    doc="T3 top-k most-similar pairs, upper triangle (day_5/day5_complete.py:122-146)",
)
def topk_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < _PAIRS_N))
    out = topk_pairs(emb, k=_PAIRS_K, metric="cosine",
                     id_col="vec_id", vec_col="embedding")
    return out.select("i", "j", F.round("score", 6).alias("score"))


@register(
    "vector_norm_stats",
    oracle="""
WITH n AS (
  SELECT vec_id, label,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT label,
       count(*) AS n_vectors,
       round(avg(nrm), 6) AS avg_norm,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       round(stddev_samp(nrm), 6) AS std_norm
FROM n GROUP BY label
""",
    doc="V8 embedding norm statistics per cluster label (day_5/day5_complete.py:53-76)",
)
def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select("label", vec_norm(F.col("embedding")).alias("nrm"))
    return (n.groupBy("label")
             .agg(F.count("*").alias("n_vectors"),
                  F.round(F.avg("nrm"), 6).alias("avg_norm"),
                  F.round(F.min("nrm"), 6).alias("min_norm"),
                  F.round(F.max("nrm"), 6).alias("max_norm"),
                  F.round(F.stddev_samp("nrm"), 6).alias("std_norm")))


@register(
    "l2_normalize_check",
    oracle="""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings WHERE vec_id < 100
), nv AS (
  SELECT vec_id,
         CASE WHEN nrm > 1e-12 THEN list_transform(ev, x -> x / nrm)
              ELSE ev END AS v
  FROM n
)
SELECT vec_id, round(sqrt(list_dot_product(v, v)), 6) AS unit_norm FROM nv
""",
    doc="V1 invariant: ||l2_normalize(v)|| == 1 for non-zero v (day_2/noramalization.py:96)",
)
def l2_normalize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (load_table(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") < 100))
    normed = emb.select("vec_id", l2_normalize(F.col("embedding")).alias("nv"))
    return normed.select(
        "vec_id", F.round(vec_norm(F.col("nv")), 6).alias("unit_norm"))
