"""Phase-by-phase first-execution decomposition of bm25_rrf_hybrid
(r10 VERDICT directive #4, companion to probe_bm25_first.py): inlines
the registered builder and forces each cached frame in dependency
order, so the 8-9 s first collect is attributed to named phases —
index build (posts/dls/tdf), batch kNN (vecb), bm25 batch scoring
(bmb), RRF fusion (rrfb), final union.

Usage: python tools/probe_bm25_phases.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_REBALANCE", "1")


def codegen_ms(spark) -> float:
    """Cumulative Janino compilation milliseconds (JVM-wide)."""
    try:
        cls = getattr(spark._jvm.org.apache.spark.metrics.source,
                      "CodegenMetrics$")
        cm = getattr(cls, "MODULE$")
        h = cm.METRIC_COMPILATION_TIME()
        return float(h.getCount()) * float(h.getSnapshot().getMean())
    except Exception:
        return float("nan")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.bm25 import (
        bm25_index,
        bm25_topk_batch,
        doc_lengths,
        rrf_fuse_batch,
        term_df,
    )
    from python_vector_db___ai_spark.operators.search import knn_join_blas
    from python_vector_db___ai_spark.plans import q_hybrid as qh
    from python_vector_db___ai_spark.plans.queries import all_queries
    from python_vector_db___ai_spark.session import get_spark, load_table

    spark = get_spark("probe_bm25_phases")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    emb0 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb0.count()
    emb0.limit(64).mapInPandas(lambda it: it, schema=emb0.schema).count()
    (emb0.limit(64)
     .withColumn("_r", F.row_number().over(Window.orderBy("vec_id")))
     .count())
    qs["knn_exact_batch"].spark_fn(spark, sf_dir).collect()

    t: dict = {}
    cg_start = codegen_ms(spark)

    def mark(key, fn):
        t0 = time.perf_counter()
        r = fn()
        t[key] = round(time.perf_counter() - t0, 3)
        return r

    docs = mark("load_docs", lambda: load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")

    posts = bm25_index(docs).cache()
    dls = doc_lengths(docs).cache()
    tdf = term_df(posts).cache()
    mark("index_build", lambda: (posts.count(), dls.count(), tdf.count()))
    index = (posts, dls, tdf)

    vecq = (emb.filter(F.col("vec_id").isin(qh._BATCH_VEC_IDS))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))
    vecb = mark("knn_build", lambda: (
        knn_join_blas(vecq, emb, k=qh._K, metric="cosine",
                      corpus_id="vec_id")
        .select("query_id", F.col("vec_id").alias("doc_id"), "rank")
        .cache()))
    mark("knn_materialize", lambda: vecb.count())

    qtable = spark.createDataFrame(
        qh._BATCH, "query_id long, terms array<string>")
    bmb = mark("bmb_build", lambda: bm25_topk_batch(
        docs, qtable, k=qh._K, k1=qh._K1, b=qh._B,
        prebuilt=index).cache())
    mark("bmb_materialize", lambda: bmb.count())
    rrfb = mark("rrf_build", lambda: rrf_fuse_batch(
        vecb, bmb, k0=qh._RRF_K0, k=qh._K).cache())
    mark("rrf_materialize", lambda: rrfb.count())

    bmb_part = bmb.select(
        F.lit("bm25_batch").alias("system"), "query_id", "doc_id",
        F.col("bm25").alias("score"), "rank")
    rrfb_part = rrfb.select(
        F.lit("rrf_batch").alias("system"), "query_id", "doc_id",
        F.col("rrf").alias("score"), "rank")
    bm_part = (bmb.filter(F.col("query_id") == 0)
               .select(F.lit("bm25").alias("system"),
                       F.lit(0).cast("long").alias("query_id"),
                       "doc_id", F.col("bm25").alias("score"), "rank"))
    rrf_part = (rrfb.filter(F.col("query_id") == 0)
                .select(F.lit("rrf").alias("system"),
                        F.lit(0).cast("long").alias("query_id"),
                        "doc_id", F.col("rrf").alias("score"), "rank"))
    mark("final_union_collect", lambda: (
        bm_part.unionByName(rrf_part)
        .unionByName(bmb_part).unionByName(rrfb_part).collect()))

    t["sum_sec"] = round(sum(v for v in t.values()), 3)
    # Janino compile milliseconds spent across ALL phases above (the
    # "codegen vs real corpus work" split of the first execution)
    t["codegen_ms"] = round(codegen_ms(spark) - cg_start, 1)
    t["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(t))


if __name__ == "__main__":
    main()
