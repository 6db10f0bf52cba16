"""MLlib LSH wrappers (SURVEY §2.9 X3/X4 substitute).

HNSW has no distributed equivalent (SURVEY §7 hard parts); the scale
substitutes are ``BucketedRandomProjectionLSH`` (L2) and ``MinHashLSH``
(Jaccard, complementing the hand-rolled oracle-checkable version in
``operators.dedup``).  Both hash each row into buckets and approximate
joins via bucket equi-joins — the same candidate-generation shape that
keeps 100-TB self-joins linear-ish.

MLlib's random hyperplanes are seeded but engine-internal, so these are
rows-only checks (no SQL oracle); recall vs the exact scan is measured
by ``operators.ivf.recall_against_exact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def brp_lsh_join(a: DataFrame, b: DataFrame, threshold: float,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 bucket_length: float = 2.0, num_hash_tables: int = 3,
                 seed: int = 42) -> DataFrame:
    """Approximate L2 similarity join: pairs with distance < threshold.
    Returns ``(id_a, id_b, l2_dist)`` with ``id_a < id_b``."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    fa = a.withColumn("_f", array_to_vector(F.col(vec_col).cast("array<double>")))
    fb = b.withColumn("_f", array_to_vector(F.col(vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_f", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed).fit(fa)
    joined = lsh.approxSimilarityJoin(fa, fb, threshold, distCol="l2_dist")
    return (joined
            .select(F.col(f"datasetA.{id_col}").alias("id_a"),
                    F.col(f"datasetB.{id_col}").alias("id_b"),
                    F.round("l2_dist", 6).alias("l2_dist"))
            .filter(F.col("id_a") < F.col("id_b")))


def brp_lsh_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
                vec_col: str = "embedding", query_id: str = "query_id",
                query_vec: str = "query_vec", corpus_id: str = "vec_id",
                bucket_length: float = 2.0, num_hash_tables: int = 3,
                seed: int = 42) -> DataFrame:
    """Approximate per-query top-k under L2 via approxSimilarityJoin +
    window, comparable row shape to ``search.knn_join``."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    fq = queries.withColumn(
        "_f", array_to_vector(F.col(query_vec).cast("array<double>")))
    fc = corpus.withColumn(
        "_f", array_to_vector(F.col(vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_f", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed).fit(fc)
    joined = lsh.approxSimilarityJoin(fq, fc, float("inf"), distCol="score")
    w = Window.partitionBy(f"datasetA.{query_id}").orderBy(
        F.col("score").asc(), F.col(f"datasetB.{corpus_id}").asc())
    return (joined
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(F.col(f"datasetA.{query_id}").alias(query_id),
                    F.col(f"datasetB.{corpus_id}").alias(corpus_id),
                    F.round("score", 6).alias("score"), "rank"))
