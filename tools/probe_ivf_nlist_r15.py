"""probe_clusters at scale-realistic nlist (r14 VERDICT directive #6).

The r14 rewrite removed the corpus-sized window exchange from the IVF
coarse probe by scoring a broadcast centroid ARRAY per row and taking
top-nprobe with ``array_sort`` + an explicit lambda comparator.  The
open risk (r14 "What's wrong" #4): the comparator is interpreted and
runs O(nlist log nlist) lambda invocations per probed row — at the
bench's small nlist that is free, at nlist >= 256 over a corpus-sized
probed side it could exceed the removed exchange.

This probe times, on a 400k-row probed side (the dedup_embedding_
pruned shape: the corpus IS the query side), at nlist in {64, 256,
1024}:

* ``window``     — the pre-r14 form: crossJoin(broadcast centroids) +
                   row_number() over (partition by id) — pays the
                   corpus-sized exchange + sort.
* ``comparator`` — the HEAD operator (array_sort with lambda
                   comparator).
* ``structsort`` — candidate replacement: score into
                   struct(sort_key, label) where sort_key encodes the
                   ordering (negated score for descending metrics,
                   NULL mapped past the max), then DEFAULT array_sort
                   (no lambda comparator — native interpreted ordering
                   on flat structs, no per-comparison Catalyst lambda
                   eval) + slice + explode.

All three are timed to a noop sink (guide §1.4) so every output
column is computed.  The window/comparator outputs are row-compared
at nlist=64 first (structsort too).

Usage::

    python tools/probe_ivf_nlist_r15.py [factor] [reps] [sf_dir]
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

NPROBE = 2  # the dedup_embedding_pruned spill default


def _window_form(queries, centroids, nprobe, metric="cosine",
                 query_id="_pid", query_vec="_pvec",
                 cluster_col="label", round_to=6):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.search import score_column

    score, desc = score_column(metric, F.col(query_vec),
                               F.col("centroid"))
    if round_to is not None:
        score = F.round(score, round_to)
    w = Window.partitionBy(query_id).orderBy(
        score.desc() if desc else score.asc(), F.col(cluster_col).asc())
    return (queries.crossJoin(F.broadcast(centroids))
            .withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") <= nprobe)
            .select(query_id, query_vec, cluster_col))


def _structsort_form(queries, centroids, nprobe, metric="cosine",
                     query_id="_pid", query_vec="_pvec",
                     cluster_col="label", round_to=6):
    """Default-ordering array_sort: sort key = (null_rank, signed
    score, label).  For a descending metric the signed score is -s
    (ascending struct order == descending score), nulls ordered last
    via a leading 0/1 field — byte-for-byte the window's
    desc-nulls-last / asc-nulls-first semantics."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.ivf import (
        DESCENDING_METRICS,
    )
    from python_vector_db___ai_spark.operators.search import score_column

    desc = metric in DESCENDING_METRICS

    def _scored(c):
        s, _ = score_column(metric, F.col(query_vec), c["c"])
        if round_to is not None:
            s = F.round(s, round_to)
        null_rank = (F.when(s.isNull(), F.lit(1 if desc else -1))
                     .otherwise(F.lit(0)))
        key = F.coalesce(-s if desc else s, F.lit(0.0))
        return F.struct(null_rank.alias("nr"), key.alias("k"),
                        c["l"].alias("l"))

    cents_row = centroids.agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(cluster_col).alias("l"),
            F.col("centroid").alias("c")))).alias("_cents"))
    top = F.slice(F.array_sort(F.transform(F.col("_cents"), _scored)),
                  1, nprobe)
    return (queries.crossJoin(F.broadcast(cents_row))
            .select(F.col(query_id), F.col(query_vec),
                    F.explode(top).alias("_t"))
            .select(query_id, query_vec,
                    F.col("_t")["l"].alias(cluster_col)))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import bench
    from python_vector_db___ai_spark.operators.ivf import probe_clusters
    from python_vector_db___ai_spark.session import get_spark, load_table
    from tools.scale_probe import inflate

    spark = get_spark("probe_ivf_nlist_r15")
    spark.sparkContext.setLogLevel("ERROR")

    emb0 = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    corpus = (inflate(emb0, factor)
              .select(F.col("vec_id").alias("_pid"),
                      F.col("embedding").alias("_pvec"))
              .repartition(par).cache())
    n = corpus.count()

    all_forms = {
        "window": _window_form,
        "comparator": lambda q, c, np_: probe_clusters(
            q, c, nprobe=np_, metric="cosine", query_id="_pid",
            query_vec="_pvec", cluster_col="label", round_to=6),
        "structsort": _structsort_form,
    }
    # SPARK_GRAFT_IVF_FORMS / SPARK_GRAFT_IVF_NLISTS trim the grid for
    # follow-up cells (the full 3x3 grid at reps=3 costs ~2 h; the
    # nlist=1024 confirmation only needs window vs comparator).
    sel = os.environ.get("SPARK_GRAFT_IVF_FORMS", "")
    forms = ({k: all_forms[k] for k in sel.split(",") if k}
             if sel else all_forms)
    nlists = tuple(int(x) for x in os.environ.get(
        "SPARK_GRAFT_IVF_NLISTS", "64,256,1024").split(",") if x)

    out = {"probe": "ivf_nlist_r15", "factor": factor, "corpus_rows": n,
           "nprobe": NPROBE, "reps": reps,
           "loadavg_start": loadavg_start, "git_head": bench._git_head()}

    for nlist in nlists:
        # synthetic centroids: nlist distinct base vectors, labels 0..
        cents = (emb0.orderBy("vec_id").limit(nlist)
                 .select(
                     F.row_number().over(Window.orderBy("vec_id"))
                     .alias("label"),
                     F.col("embedding").cast("array<double>")
                     .alias("centroid"))
                 .cache())
        cents.count()
        key = f"nlist_{nlist}"
        out[key] = {}
        # row-equality gate (order-insensitive), smallest nlist only —
        # the big-nlist reps are timing-only
        if nlist == 64:
            ref = None
            for label, form in forms.items():
                got = {(r["_pid"], r["label"]) for r in
                       (form(corpus, cents, NPROBE)
                        .select("_pid", "label").collect())}
                if ref is None:
                    ref = got
                else:
                    assert got == ref, f"{label}@nlist={nlist} differ"
            print(f"row-equality OK at nlist=64 ({len(ref)} rows)",
                  flush=True)
        for label, form in forms.items():
            runs, metrics = [], []
            for _ in range(reps):
                snap = bench._stage_ids_snapshot(spark)
                t0 = time.perf_counter()
                (form(corpus, cents, NPROBE)
                 .write.format("noop").mode("overwrite").save())
                runs.append(round(time.perf_counter() - t0, 3))
                metrics.append(bench._stage_metrics_since(spark, snap))
            runs_sorted = sorted(runs)
            med_i = runs.index(runs_sorted[len(runs) // 2])
            out[key][label] = {"sec": runs_sorted[len(runs) // 2],
                               "sec_runs": runs_sorted,
                               "stage_metrics": metrics[med_i]}
            print(json.dumps({key: {label: out[key][label]}}),
                  flush=True)
        cents.unpersist()

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
