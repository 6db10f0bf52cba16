"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query (logical plan build + execution +
collect), after a session warm-up action, mirroring the reference's
batch-search timing (day_6/day6_complete.py:86-99 times the whole
100-query ``index.search`` call).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from python_vector_db___ai_spark.plans.queries import all_queries  # noqa: E402
from python_vector_db___ai_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (SURVEY §2 coverage).
HEADLINE = [
    "knn_exact_batch",         # J1/T2 exact batch kNN, 3 metrics (BLAS local top-k)
    "ivf_search_cosine",       # X2 IVF pruned ANN search
    "ann_recall_ivf",          # X6 recall harness (approx + exact)
    "topk_similar_pairs",      # T3 all-pairs top-k (cosine + euclidean-sim)
    "ir_metrics_per_query",    # W1-W6 ranking metrics
    "dedup_exact_simhash",     # exact dedup groupBy + SimHash fingerprints
    "dedup_minhash_lsh",       # MinHash+LSH banding
    "dedup_simhash_pairs",     # SimHash pairs via pigeonhole blocking
    "dedup_embedding_pruned",  # IVF-pruned semantic near-dup
    "text_profile",            # language ID + quality + token counts
    "chunk_chars_fixed",       # char chunker (pure expressions)
    "embed_cache_hits",        # embedding pipeline (mock model + cache join)
    "rag_end_to_end",          # RAG context -> prompt -> answer
    "events_sessionization",   # gap sessionization window
    "tpch_q1_pricing",         # relational aggregation
    "tpch_q3_topk",            # 3-way join + top-k
    "bm25_rrf_hybrid",         # lexical retrieval + RRF fusion
    "embedding_quantize_int8", # int8 quantization error stats
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warm-up: JVM codegen, Python worker pool, and parquet footers
    # don't belong to any query — prime each execution path once.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()
    emb.limit(64).mapInPandas(lambda it: it, schema=emb.schema).count()
    (emb.limit(64)
     .withColumn("_r", F.row_number().over(Window.orderBy("vec_id")))
     .count())

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name].spark_fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    ann = ann_benchmark(spark, sf_dir)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "ann": ann,
        "sf": sf,
    }))
    spark.stop()


def ann_benchmark(spark, sf_dir: str) -> dict:
    """The day-6 benchmark shape (BASELINE.md): a 100-query batch kNN
    at k=10, exact vs IVF vs LSH, with recall@10 measured against the
    exact scan."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.ivf import (
        ivf_search,
        recall_against_exact,
    )
    from python_vector_db___ai_spark.operators.lsh import brp_lsh_knn
    from python_vector_db___ai_spark.operators.search import knn_join_blas
    from python_vector_db___ai_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = (emb.filter(F.col("vec_id") < 100)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))

    out: dict = {"n_queries": 100, "k": 10}

    t0 = time.perf_counter()
    exact = knn_join_blas(queries, emb, k=10, metric="cosine",
                          corpus_id="vec_id")
    exact_rows = exact.collect()
    out["exact_sec"] = round(time.perf_counter() - t0, 4)
    exact_cached = spark.createDataFrame(exact_rows, exact.schema).cache()

    # Index build (centroids) reported separately, like the reference's
    # build-vs-search split (day6_performance_summary.csv).
    from python_vector_db___ai_spark.operators.ivf import build_centroids

    t0 = time.perf_counter()
    centroids = build_centroids(emb, cluster_col="label",
                                vec_col="embedding").cache()
    centroids.count()
    out["ivf_build_sec"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    ivf = ivf_search(queries, emb, centroids=centroids, nprobe=3, k=10,
                     metric="cosine", corpus_id="vec_id", cluster_col="label")
    ivf_rows = ivf.collect()
    out["ivf_sec"] = round(time.perf_counter() - t0, 4)
    ivf_cached = spark.createDataFrame(ivf_rows, ivf.schema)
    out["ivf_recall"] = round(
        recall_against_exact(ivf_cached, exact_cached, corpus_id="vec_id")
        .agg(F.avg("recall")).collect()[0][0], 4)

    t0 = time.perf_counter()
    exact_l2 = knn_join_blas(queries, emb, k=10, metric="l2",
                             corpus_id="vec_id")
    lsh = brp_lsh_knn(queries, emb, k=10)
    lsh_rows = lsh.collect()
    out["lsh_sec"] = round(time.perf_counter() - t0, 4)
    lsh_cached = spark.createDataFrame(lsh_rows, lsh.schema)
    out["lsh_recall"] = round(
        recall_against_exact(lsh_cached, exact_l2, corpus_id="vec_id")
        .agg(F.avg("recall")).collect()[0][0], 4)
    emb.unpersist()
    return out


if __name__ == "__main__":
    main()
