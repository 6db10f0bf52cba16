"""Crossdoc-dup-ngrams A/B probe (r14 VERDICT directive #1).

Times three plan variants of ``crossdoc_dup_ngrams`` at an inflated
corpus factor (default 400 = 2M docs) under the exact sweep protocol
(62.5k docs/split, cached input, reps with stage-metric attribution):

* **v0_current** — the HEAD operator (single gkey exchange; the solo
  aggregation re-shuffles ~all distinct grams by doc).
* **v1_wordhash** — same shape, but each word is xxhash64-hashed ONCE
  and the gram key is xxhash64 over the (narrow, fixed-width) hash
  slice instead of over the 8-string slice (guide §2.3 narrower
  types / §4.2 per-element cost; interpreted HOF lambdas pay per
  element).  gkey values differ — gkey is internal, results identical
  modulo 64-bit collisions exactly as the r8 xxhash64 switch argued.
* **v2_dupset** — v1's keying plus a structural change (guide §2.4 /
  §8): pass 1 aggregates the gkey exchange down to the DUPLICATED
  gram keys only (min(doc) != max(doc)); pass 2 re-explodes the
  corpus, drops non-dup positions against the broadcast dup-key set,
  and counts per doc map-side — the per-doc aggregation runs over
  the UNSHUFFLED explode (a doc's positions are contiguous in its
  input partition), so the second exchange carries ~n_docs rows
  instead of ~all solo grams.

Each variant's aggregate output (sum n_grams, sum dup_grams,
avg frac) is printed next to its timing; v1/v2 are additionally
row-compared against v0 at a small factor before the big timing.

Usage::

    python tools/probe_crossdoc_r15.py [factor] [reps] [sf_dir]

Appends one JSON row to ``PROBES_r15.json`` when
``SPARK_GRAFT_PROBE_TAG=r15`` is set (same artifact protocol as
tools/probe_query.py).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("SPARK_GRAFT_REBALANCE", "1")


def _variant_keys(words, n: int, wordhash: bool):
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.functions.expr import let

    if not wordhash:
        return let(words, lambda ws: F.when(
            F.size(ws) >= n,
            F.transform(F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                        lambda i: F.xxhash64(F.slice(ws, i, n))))
            .otherwise(F.array().cast("array<bigint>")))
    hashed = F.transform(words, lambda w: F.xxhash64(w))
    return let(hashed, lambda hs: F.when(
        F.size(hs) >= n,
        F.transform(F.sequence(F.lit(1), F.size(hs) - (n - 1)),
                    lambda i: F.xxhash64(F.slice(hs, i, n))))
        .otherwise(F.array().cast("array<bigint>")))


def _crossdoc_variant(docs, n=8, *, wordhash=False, dupset=False,
                      shuffle_partitions=None):
    """Re-implementation of the operator with the two probe knobs.
    ``wordhash=False, dupset=False`` must match the HEAD operator's
    plan (sanity: compared against the real operator too)."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.dedup import words_col
    from python_vector_db___ai_spark.operators.quality import (
        GRAMS_PER_PARTITION,
    )

    id_col, text_col, round_to = "doc_id", "text", 6
    words = words_col(F.col(text_col))
    keys = _variant_keys(words, n, wordhash)
    pos = docs.select(F.col(id_col), F.explode(keys).alias("gkey"))
    if shuffle_partitions is None:
        total = docs.select(
            F.sum(F.greatest(F.size(words) - (n - 1), F.lit(0)))
            .alias("g")).first()["g"] or 0
        floor = docs.sparkSession.sparkContext.defaultParallelism
        shuffle_partitions = min(
            max(floor, math.ceil(total / GRAMS_PER_PARTITION)), 4096)
    pos = pos.repartition(int(shuffle_partitions), "gkey")
    totals = docs.select(
        F.col(id_col),
        F.greatest(F.size(words) - (n - 1), F.lit(0)).cast("long")
        .alias("n_grams"))
    if not dupset:
        solo = (pos.groupBy("gkey")
                .agg(F.min(id_col).alias("_d1"),
                     F.max(id_col).alias("_d2"),
                     F.count("*").alias("_sc"))
                .filter(F.col("_d1") == F.col("_d2"))
                .groupBy(F.col("_d1").alias(id_col))
                .agg(F.sum("_sc").alias("solo_grams")))
        joined = (totals.join(solo, id_col, "left")
                  .select(id_col, "n_grams",
                          (F.col("n_grams")
                           - F.coalesce("solo_grams", F.lit(0)))
                          .cast("long").alias("dup_grams")))
    else:
        dup = (pos.groupBy("gkey")
               .agg(F.min(id_col).alias("_d1"), F.max(id_col).alias("_d2"))
               .filter(F.col("_d1") != F.col("_d2"))
               .select("gkey"))
        # second pass over the UNSHUFFLED explode: per-doc counts
        # collapse map-side (a doc's positions are contiguous), so the
        # exchange under this groupBy carries ~n_docs rows.
        pos2 = docs.select(F.col(id_col), F.explode(keys).alias("gkey"))
        dup_mass = (pos2.join(F.broadcast(dup), "gkey")
                    .groupBy(id_col)
                    .agg(F.count("*").cast("long").alias("dup_grams")))
        joined = (totals.join(dup_mass, id_col, "left")
                  .select(id_col, "n_grams",
                          F.coalesce("dup_grams", F.lit(0)).cast("long")
                          .alias("dup_grams")))
    return joined.select(
        id_col, "n_grams", "dup_grams",
        F.round(F.when(F.col("n_grams") > 0,
                       F.col("dup_grams").cast("double")
                       / F.col("n_grams")).otherwise(0.0), round_to)
        .alias("crossdoc_dup_frac"))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import functions as F

    import bench
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )
    from python_vector_db___ai_spark.session import get_spark, load_table
    from tools.scale_probe import inflate_docs

    spark = get_spark("probe_crossdoc_r15")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = load_table(spark, sf_dir, "documents")
    n_base = docs0.count()

    # --- small-factor row-equality gate first (factor 10) ---
    small_tmp = tempfile.mkdtemp(prefix="probe_xdoc_eq_")
    inflate_docs(docs0, 10).write.parquet(small_tmp, mode="overwrite")
    small = spark.read.parquet(small_tmp).repartition(32).cache()
    small.count()
    ref = {tuple(r) for r in
           crossdoc_dup_ngrams(small, n=8).collect()}
    for label, kw in (("v1", dict(wordhash=True)),
                      ("v2", dict(wordhash=True, dupset=True))):
        got = {tuple(r) for r in
               _crossdoc_variant(small, n=8, **kw).collect()}
        assert got == ref, f"{label} rows differ at factor 10"
    print(f"row-equality OK at factor 10 ({len(ref)} docs)", flush=True)
    small.unpersist()

    # --- timed A/B at the target factor ---
    tmp = tempfile.mkdtemp(prefix=f"probe_xdoc_{factor}_")
    inflate_docs(docs0, factor).write.parquet(tmp, mode="overwrite")
    par = spark.sparkContext.defaultParallelism
    n_splits = max(par, n_base * factor // 62500)
    docs = spark.read.parquet(tmp).repartition(n_splits).cache()
    n = docs.count()

    variants = {
        "v0_current": lambda: crossdoc_dup_ngrams(docs, n=8),
        "v1_wordhash": lambda: _crossdoc_variant(docs, n=8,
                                                 wordhash=True),
        "v2_dupset": lambda: _crossdoc_variant(docs, n=8, wordhash=True,
                                               dupset=True),
    }
    out = {"probe": "crossdoc_r15", "factor": factor, "doc_rows": n,
           "reps": reps, "loadavg_start": loadavg_start,
           "git_head": bench._git_head()}
    for label, build in variants.items():
        runs, metrics = [], []
        for _ in range(reps):
            snap = bench._stage_ids_snapshot(spark)
            t0 = time.perf_counter()
            row = build().agg(
                F.sum("n_grams").alias("g"),
                F.sum("dup_grams").alias("d"),
                F.round(F.avg("crossdoc_dup_frac"), 6).alias("f")
            ).collect()[0]
            runs.append(round(time.perf_counter() - t0, 3))
            metrics.append(bench._stage_metrics_since(spark, snap))
        runs_sorted = sorted(runs)
        med_i = runs.index(runs_sorted[len(runs) // 2])
        out[label] = {
            "sec": runs_sorted[len(runs) // 2],
            "sec_runs": runs_sorted,
            "grams": int(row["g"]), "dup_grams": int(row["d"]),
            "avg_frac": float(row["f"]),
            "stage_metrics": metrics[med_i],
        }
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
