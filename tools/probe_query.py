"""Quiet-machine probe of one registered query under the exact bench
protocol (rebalanced documents, warm-up, end-to-end build+collect
timing): ``python tools/probe_query.py <name> [n_runs] [sf_dir]``.
Prints ordered runs + sorted spread, for attributing driver-run
timing drift to machine variance vs plan changes (r10 directive #5).

Artifact protocol (r12 VERDICT directive #5): when
``SPARK_GRAFT_PROBE_TAG`` is set, each probe APPENDS its result row to
``PROBES_<tag>.json`` in the repo root (a JSON array), with
loadavg_start/loadavg_end and the git HEAD recorded — so every
driver-vs-committed drift adjudication quoted in README/COVERAGE
cites committed, recomputable JSON instead of prose, the same
standard tools/slopes.py set for slope claims.  Example::

    SPARK_GRAFT_PROBE_TAG=r13 python tools/probe_query.py \
        dedup_incremental_minhash 3
    # -> appends to PROBES_r13.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("SPARK_GRAFT_REBALANCE", "1")


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.plans.queries import all_queries
    from python_vector_db___ai_spark.session import get_spark

    spark = get_spark("probe_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()
    emb.limit(64).mapInPandas(lambda it: it, schema=emb.schema).count()
    (emb.limit(64)
     .withColumn("_r", F.row_number().over(Window.orderBy("vec_id")))
     .count())
    qs["knn_exact_batch"].spark_fn(spark, sf_dir).collect()

    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        qs[name].spark_fn(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 4))

    try:
        head = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        head = None
    row = {
        "query": name, "sf_dir": sf_dir,
        "runs_ordered": runs, "spread": sorted(runs),
        "median": sorted(runs)[len(runs) // 2],
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "git_head": head,
        "ts": round(time.time(), 1),
    }
    print(json.dumps(row))

    tag = os.environ.get("SPARK_GRAFT_PROBE_TAG", "")
    if tag:
        path = ROOT / f"PROBES_{tag}.json"
        # Tolerate a truncated/corrupt existing file (fall back to
        # []) and replace atomically so a concurrent or interrupted
        # probe can't discard this run's appendable result (r13
        # ADVICE).
        try:
            rows = json.loads(path.read_text()) if path.exists() else []
            if not isinstance(rows, list):
                rows = []
        except (json.JSONDecodeError, OSError):
            rows = []
        rows.append(row)
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rows, indent=1) + "\n")
        os.replace(tmp, path)
        print(f"appended to {path.name} ({len(rows)} rows)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
