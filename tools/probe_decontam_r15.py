"""Decontaminate Expand-x2 A/B probe (r14 VERDICT directive #5).

The HEAD operator's ``agg(countDistinct(sh), countDistinct(_bid))``
pair plans an Expand x2 over every joined posting row (each row
duplicated per distinct-aggregate group).  Variant B keeps ONE
distinct aggregate (``countDistinct(sh)``) and computes the benchmark
-doc count as ``size(collect_set(_bid))`` — a regular aggregate, so
the single-distinct plan needs no Expand at all (Spark rewrites one
distinct group + regular aggs as a two-level aggregation keyed by
(group, sh)).  ``size(collect_set(x))`` == ``countDistinct(x)``
exactly (both ignore NULLs; _bid is never NULL), and the per-group
sets are tiny (benchmark docs hitting one training doc).

Times both variants at an inflated corpus factor (default 400 = 2M
docs) under the sweep protocol, with a full row-equality gate at
factor 10 first.

Usage::

    python tools/probe_decontam_r15.py [factor] [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("SPARK_GRAFT_REBALANCE", "1")


def _decontaminate_b(train, benchmark, n=5, min_hits=1,
                     text_col="text", id_col="doc_id"):
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.dedup import (
        hashed_word_shingles,
    )

    shingles = hashed_word_shingles
    tr = train.select(F.col(id_col).alias("_tid"),
                      shingles(F.col(text_col), n).alias("_sh"))
    tr_post = tr.select("_tid", F.size("_sh").alias("_nsh"),
                        F.explode("_sh").alias("sh"))
    bm_post = (benchmark
               .select(F.col(id_col).alias("_bid"),
                       F.explode(shingles(F.col(text_col), n))
                       .alias("sh")))
    hits = (tr_post.join(bm_post, "sh")
            .groupBy("_tid", "_nsh")
            .agg(F.countDistinct("sh").cast("long")
                 .alias("n_hit_shingles"),
                 F.size(F.collect_set("_bid")).cast("long")
                 .alias("n_benchmark_docs")))
    return (hits.filter(F.col("n_hit_shingles") >= min_hits)
            .select(F.col("_tid").alias(id_col), "n_hit_shingles",
                    "n_benchmark_docs",
                    F.round(F.col("n_hit_shingles")
                            / F.greatest(F.col("_nsh"), F.lit(1)), 6)
                    .alias("contamination")))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import functions as F

    import bench
    from python_vector_db___ai_spark.operators.dedup import decontaminate
    from python_vector_db___ai_spark.session import get_spark, load_table
    from tools.scale_probe import inflate_docs

    spark = get_spark("probe_decontam_r15")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = load_table(spark, sf_dir, "documents")
    n_base = docs0.count()

    def bench_side():
        return (inflate_docs(docs0, 1).limit(100)
                .select((F.col("doc_id") + 2 * 10 ** 9).alias("doc_id"),
                        "text"))

    # row-equality gate at factor 10
    small_tmp = tempfile.mkdtemp(prefix="probe_dct_eq_")
    inflate_docs(docs0, 10).write.parquet(small_tmp, mode="overwrite")
    small = spark.read.parquet(small_tmp).repartition(32).cache()
    small.count()
    ref = {tuple(r) for r in
           decontaminate(small, bench_side(), n=5).collect()}
    got = {tuple(r) for r in
           _decontaminate_b(small, bench_side(), n=5).collect()}
    assert got == ref, "variant B rows differ at factor 10"
    print(f"row-equality OK at factor 10 ({len(ref)} hit docs)",
          flush=True)
    small.unpersist()

    tmp = tempfile.mkdtemp(prefix=f"probe_dct_{factor}_")
    inflate_docs(docs0, factor).write.parquet(tmp, mode="overwrite")
    par = spark.sparkContext.defaultParallelism
    n_splits = max(par, n_base * factor // 62500)
    docs = spark.read.parquet(tmp).repartition(n_splits).cache()
    n = docs.count()

    out = {"probe": "decontam_r15", "factor": factor, "doc_rows": n,
           "reps": reps, "loadavg_start": loadavg_start,
           "git_head": bench._git_head()}
    for label, fn in (("a_expand", decontaminate),
                      ("b_collectset", _decontaminate_b)):
        runs, metrics = [], []
        hitrow = None
        for _ in range(reps):
            snap = bench._stage_ids_snapshot(spark)
            t0 = time.perf_counter()
            hitrow = fn(docs, bench_side(), n=5).count()
            runs.append(round(time.perf_counter() - t0, 3))
            metrics.append(bench._stage_metrics_since(spark, snap))
        runs_sorted = sorted(runs)
        med_i = runs.index(runs_sorted[len(runs) // 2])
        out[label] = {"sec": runs_sorted[len(runs) // 2],
                      "sec_runs": runs_sorted, "hits": int(hitrow),
                      "stage_metrics": metrics[med_i]}
        print(json.dumps({label: out[label]}), flush=True)

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    tag = os.environ.get("SPARK_GRAFT_PROBE_TAG")
    if tag:
        path = ROOT / f"PROBES_{tag}.json"
        rows = json.loads(path.read_text()) if path.exists() else []
        rows.append(out)
        path.write_text(json.dumps(rows, indent=1) + "\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
