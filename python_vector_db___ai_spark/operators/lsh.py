"""LSH approximate nearest neighbors (SURVEY §2.9 X3/X4 substitute).

HNSW has no distributed equivalent (SURVEY §7 hard parts); the scale
substitutes hash each row into buckets and approximate joins via
bucket *equi-joins* — the candidate-generation shape that keeps 100-TB
self-joins linear-ish.

The primary implementation is :func:`srp_lsh_knn` — hand-rolled
sign-random-projection (hyperplane) LSH: seeded hyperplanes, one Arrow
pass to compute per-table bucket keys, candidate equi-join on
``(table, bucket)`` with a hot-bucket cap, exact BLAS re-rank of the
candidates.  Candidate volume is bounded by construction (cap × tables
per query), unlike ``approxSimilarityJoin`` with an unbounded
threshold, so a skewed bucket can never fan out a 100-TB join.

The MLlib ``BucketedRandomProjectionLSH`` wrappers remain for parity;
their hyperplanes are engine-internal, so all LSH checks are rows-only
(no SQL oracle) and recall is measured against the exact scan by
``operators.ivf.recall_against_exact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _srp_bucket_frame(df: DataFrame, H, n_tables: int, n_bits: int,
                      id_col: str, vec_col: str) -> DataFrame:
    """One Arrow pass: (id, table, bucket) rows, one row per hash
    table.  ``bucket`` packs the sign bits of the table's hyperplane
    projections into an int."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(H)
    pw = (1 << np.arange(n_bits)).astype(np.int64)

    def op(batches):
        Hm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (V @ Hm.T) > 0
            out = []
            for t in range(n_tables):
                keys = bits[:, t * n_bits:(t + 1) * n_bits] @ pw
                out.append(pd.DataFrame({
                    id_col: pdf[id_col],
                    "table": np.full(len(keys), t, dtype=np.int32),
                    "bucket": keys}))
            yield pd.concat(out, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        op, schema=f"{id_col} long, table int, bucket long")


def srp_build(corpus: DataFrame, n_tables: int = 8, n_bits: int = 12,
              seed: int = 42, corpus_id: str = "vec_id",
              vec_col: str = "embedding"):
    """Build the SRP index: seeded hyperplanes + the corpus bucket
    frame.  Cache (or write partitioned by ``(table, bucket)``) and
    reuse across query batches — the build amortizes exactly like the
    reference's index construction."""
    import numpy as np

    rng = np.random.default_rng(seed)
    dim = len(corpus.select(vec_col).first()[0])
    H = rng.standard_normal((n_tables * n_bits, dim))
    cb = _srp_bucket_frame(corpus, H, n_tables, n_bits, corpus_id, vec_col)
    return H, cb


def srp_lsh_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
                n_tables: int = 8, n_bits: int = 12, seed: int = 42,
                metric: str = "cosine", max_bucket: int | None = 2048,
                query_id: str = "query_id", query_vec: str = "query_vec",
                corpus_id: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6, prebuilt=None) -> DataFrame:
    """Approximate per-query top-k via sign-random-projection LSH.

    Plan shape: two narrow bucket scans -> equi-join on
    ``(table, bucket)`` -> distinct candidates -> vector joins -> BLAS
    re-rank.  ``max_bucket`` drops buckets larger than the cap before
    the join (the stop-shingle trick), so candidate fan-out per query
    is at most ``n_tables × max_bucket`` regardless of skew.  Queries
    whose buckets are all dropped return < k rows — the caller decides
    whether to fall back to the exact scan for those.

    ``prebuilt``: an ``(H, corpus_bucket_frame)`` pair from
    :func:`srp_build` — pass it to amortize the corpus bucket pass
    across query batches.
    """
    from python_vector_db___ai_spark.operators.ivf import _score_pairs_blas

    if prebuilt is not None:
        H, cb = prebuilt
    else:
        H, cb = srp_build(corpus, n_tables, n_bits, seed, corpus_id, vec_col)
    qb = _srp_bucket_frame(queries, H, n_tables, n_bits, query_id, query_vec)
    if max_bucket is not None:
        sizes = (cb.groupBy("table", "bucket")
                 .agg(F.count("*").alias("_bn"))
                 .filter(F.col("_bn") <= max_bucket)
                 .select("table", "bucket"))
        cb = cb.join(sizes, ["table", "bucket"])
    cand = (qb.join(cb, ["table", "bucket"])
            .select(query_id, corpus_id)
            .distinct())
    pairs = (cand
             .join(queries.select(query_id, query_vec), query_id)
             .join(corpus.select(F.col(corpus_id), F.col(vec_col)
                                 .alias("_cvec")), corpus_id))
    desc = metric in ("cosine", "inner_product", "euclidean_similarity")
    scored = _score_pairs_blas(
        pairs.select(query_id, corpus_id, query_vec, "_cvec"),
        k, metric, query_id, query_vec, corpus_id, "_cvec", round_to, desc)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc() if desc else F.col("score").asc(),
        F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "score", "rank"))


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


def estimate_knn_radius(corpus: DataFrame, k: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        sample_rows: int = 256) -> float:
    """Estimate an L2 radius that captures ~k neighbors per point: the
    distance to the k-th neighbor, averaged over a small deterministic
    sample, inflated 1.5×.  One tiny driver-side kernel — the number
    parameterizes the bounded similarity join below."""
    import numpy as np

    rows = (corpus.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_rows).collect())
    V = np.array([r[vec_col] for r in rows], dtype=np.float64)
    sq = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    kth = np.sqrt(np.partition(sq, min(k, len(V) - 1), axis=1)
                  [:, min(k, len(V) - 1)])
    return float(np.mean(kth) * 1.5)


def brp_lsh_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
                vec_col: str = "embedding", query_id: str = "query_id",
                query_vec: str = "query_vec", corpus_id: str = "vec_id",
                bucket_length: float | None = None,
                num_hash_tables: int = 3,
                threshold: float | None = None,
                seed: int = 42) -> DataFrame:
    """Approximate per-query top-k under L2 via a *bounded*
    approxSimilarityJoin + window, comparable row shape to
    ``search.knn_join``.

    The join threshold is always finite: given ``None`` it derives from
    the sampled k-th-neighbor radius (:func:`estimate_knn_radius`), so
    bucket-cohabiting pairs beyond the radius are pruned inside the
    join instead of materialized — an unbounded (inf) threshold turns
    a skewed bucket into quadratic fan-out at scale.  ``bucket_length``
    defaults to the same radius (the E2LSH w ≈ search radius rule).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    if threshold is None:
        threshold = estimate_knn_radius(corpus, k, vec_col, corpus_id)
    if bucket_length is None:
        bucket_length = threshold
    fq = queries.withColumn(
        "_f", array_to_vector(F.col(query_vec).cast("array<double>")))
    fc = corpus.withColumn(
        "_f", array_to_vector(F.col(vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_f", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed).fit(fc)
    joined = lsh.approxSimilarityJoin(fq, fc, threshold, distCol="score")
    w = Window.partitionBy(f"datasetA.{query_id}").orderBy(
        F.col("score").asc(), F.col(f"datasetB.{corpus_id}").asc())
    return (joined
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(F.col(f"datasetA.{query_id}").alias(query_id),
                    F.col(f"datasetB.{corpus_id}").alias(corpus_id),
                    F.round("score", 6).alias("score"), "rank"))
