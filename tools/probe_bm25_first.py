"""Attribute bm25_rrf_hybrid's first-execution cost (r10 VERDICT
directive #4: 8.98 s first run vs 2.3 s steady state — the largest
cold-start in the suite).

Replicates the bench protocol (rebalanced documents, sf0.1, session
warm-up, flagship warm-up) and splits the FIRST execution into:

* build_sec     — the registered builder call.  Every ``.cache()``
  inside it EAGERLY analyzes + optimizes that subtree (cacheQuery
  needs the optimized plan), so builder time is mostly Catalyst.
* plan_sec      — forcing ``executedPlan`` of the returned frame
  (optimization + physical planning of the final union, with cache
  substitution).
* collect_sec   — first execution: materializes all five cached
  frames (each its own jobs + whole-stage codegen compiles) and runs
  the final union.

Janino compile time (JVM-wide CodegenMetrics histogram) is sampled at
each boundary, so "codegen" vs "real corpus work" inside collect_sec
is separable.  Five more ordered end-to-end runs follow (fresh builder
each run, the bench's timing unit) for the steady-state level.

Usage: python tools/probe_bm25_first.py [sf_dir]
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
        snap = h.getSnapshot()
        return float(h.getCount()) * float(snap.getMean())
    except Exception as e:  # metrics registry moved? degrade loudly
        print(f"codegen metrics unavailable: {e}", file=sys.stderr)
        return float("nan")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.plans.queries import all_queries
    from python_vector_db___ai_spark.session import get_spark

    spark = get_spark("probe_bm25_first")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # bench warm-up, verbatim
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()
    emb.limit(64).mapInPandas(lambda it: it, schema=emb.schema).count()
    (emb.limit(64)
     .withColumn("_r", F.row_number().over(Window.orderBy("vec_id")))
     .count())
    qs["knn_exact_batch"].spark_fn(spark, sf_dir).collect()

    fn = qs["bm25_rrf_hybrid"].spark_fn
    out: dict = {"sf_dir": sf_dir, "loadavg": list(os.getloadavg())}

    cg0 = codegen_ms(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    cg1 = codegen_ms(spark)
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    cg2 = codegen_ms(spark)
    df.collect()
    t3 = time.perf_counter()
    cg3 = codegen_ms(spark)

    out["first"] = {
        "build_sec": round(t1 - t0, 3),
        "plan_sec": round(t2 - t1, 3),
        "collect_sec": round(t3 - t2, 3),
        "total_sec": round(t3 - t0, 3),
        "codegen_ms_build": round(cg1 - cg0, 1),
        "codegen_ms_plan": round(cg2 - cg1, 1),
        "codegen_ms_collect": round(cg3 - cg2, 1),
    }

    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    out["steady_runs_ordered"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
