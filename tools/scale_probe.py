"""Scale probe: demonstrate the exact-vs-IVF crossover with data.

At sf0.1 (2k vectors) Spark overhead dominates and the exact BLAS scan
wins.  This probe inflates the embeddings corpus by a deterministic
factor (replicating rows with md5-derived noise, preserving cluster
structure), writes it cluster-partitioned, and times exact vs IVF at
increasing corpus sizes — the numbers behind the README's claim that
IVF's partition pruning pays off as the corpus grows.

Usage::

    python tools/scale_probe.py [factor ...]   # default 10 50
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash64
from python_vector_db___ai_spark.operators.ivf import (
    build_centroids,
    ivf_search,
    recall_against_exact,
)
from python_vector_db___ai_spark.operators.search import knn_join_blas
from python_vector_db___ai_spark.session import get_spark, load_table


def inflate(emb, factor: int):
    """factor copies of each vector with +-2% deterministic noise; copy
    r of vector v gets id v*factor+r.  Cluster labels are preserved, so
    the inflated corpus keeps the IVF-friendly structure."""
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("copy")
    base = emb.select("vec_id", "label", "embedding", copies)
    noise_scale = 0.02
    noisy = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        * (1.0 + ((stable_hash64(
            F.concat_ws(":", F.col("vec_id"), F.col("copy"), i.cast("string")))
            % 1000) / F.lit(1000.0) - 0.5) * 2 * noise_scale))
    return base.select(
        (F.col("vec_id") * factor + F.col("copy")).alias("vec_id"),
        "label", noisy.alias("embedding"))


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [10, 50]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 100)
               .select((F.col("vec_id") * 10 ** 6).alias("query_id"),
                       F.col("embedding").alias("query_vec")))

    results = []
    for factor in factors:
        tmp = tempfile.mkdtemp(prefix=f"scale_{factor}_")
        inflate(emb, factor).write.partitionBy("label").parquet(tmp,
                                                               mode="overwrite")
        corpus = spark.read.parquet(tmp)
        n = corpus.count()

        t0 = time.perf_counter()
        exact = knn_join_blas(queries, corpus, k=10, metric="cosine",
                              corpus_id="vec_id")
        exact_rows = exact.collect()
        exact_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        cents = build_centroids(corpus, cluster_col="label",
                                vec_col="embedding").cache()
        cents.count()
        build_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        approx = ivf_search(queries, corpus, centroids=cents, nprobe=3,
                            k=10, metric="cosine", corpus_id="vec_id",
                            cluster_col="label")
        approx_rows = approx.collect()
        ivf_sec = round(time.perf_counter() - t0, 3)

        exact_df = spark.createDataFrame(exact_rows, exact.schema)
        approx_df = spark.createDataFrame(approx_rows, approx.schema)
        recall = round(
            recall_against_exact(approx_df, exact_df, corpus_id="vec_id")
            .agg(F.avg("recall")).collect()[0][0], 4)
        results.append({"factor": factor, "corpus_rows": n,
                        "exact_sec": exact_sec, "ivf_build_sec": build_sec,
                        "ivf_sec": ivf_sec, "ivf_recall": recall})
        print(json.dumps(results[-1]))
    print(json.dumps({"scale_probe": results}))
    spark.stop()


if __name__ == "__main__":
    main()
