"""Per-query stage-level attribution of the headline list (guide §1).

For each headline query: one untimed warm run, then one timed run with
a status-store stage snapshot before/after, so wall seconds decompose
into executor run/cpu/GC, task counts, shuffle bytes and stage count.
Usage::

    python tools/profile_headline.py [sf_dir] [query ...]

Prints one JSON line per query and a sorted summary.  Pure diagnostic
tool — never writes artifacts of record.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("SPARK_GRAFT_REBALANCE", "1")


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else "/root/testdata/sf0.1")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import bench
    from python_vector_db___ai_spark.plans.queries import all_queries
    from python_vector_db___ai_spark.session import get_spark

    spark = get_spark("profile_headline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()
    emb.limit(64).mapInPandas(lambda it: it, schema=emb.schema).count()
    (emb.limit(64)
     .withColumn("_r", F.row_number().over(Window.orderBy("vec_id")))
     .count())
    qs["knn_exact_batch"].spark_fn(spark, sf_dir).collect()

    names = sys.argv[2:] or bench.HEADLINE
    tracker = spark.sparkContext.statusTracker()
    rows = []
    for name in names:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # untimed warm run (the bench median also excludes run 1)
        qs[name].spark_fn(spark, sf_dir).collect()
        before = bench._stage_ids_snapshot(spark)
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        qs[name].spark_fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        m = bench._stage_metrics_since(spark, before) or {}
        row = {
            "query": name,
            "wall_s": round(wall, 3),
            "n_jobs": jobs1 - jobs0,
            "n_stages": m.get("n_stages"),
            "tasks": m.get("tasks"),
            "run_ms": m.get("run_ms"),
            "cpu_ms": m.get("cpu_ms"),
            "gc_ms": m.get("gc_ms"),
            "shuffle_write_mb": m.get("shuffle_write_mb"),
            "input_mb": m.get("input_mb"),
            "top_stage": (m.get("top_stage") or {}).get("name"),
            "top_stage_run_ms": (m.get("top_stage") or {}).get("run_ms"),
        }
        rows.append(row)
        print(json.dumps(row))
        spark.sparkContext.setJobDescription(None)

    rows.sort(key=lambda r: -r["wall_s"])
    print("\n== sorted by wall ==")
    for r in rows:
        print(f"{r['query']:34s} {r['wall_s']:7.3f}s jobs={r['n_jobs']:3d} "
              f"stages={r['n_stages']} tasks={r['tasks']} "
              f"run={r['run_ms']}ms cpu={r['cpu_ms']}ms gc={r['gc_ms']}ms "
              f"shw={r['shuffle_write_mb']}MB")
    print(json.dumps({"total_wall_s": round(sum(r['wall_s'] for r in rows), 3),
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
