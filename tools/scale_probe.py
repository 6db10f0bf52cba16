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


def inflate_docs(docs, factor: int):
    """``factor`` copies of each document for the dedup/text scale
    bench.  Copy ``r`` appends a copy-specific salt to every 5th word
    (one JVM-side ``transform``), which rewrites most word shingles —
    so copies of one doc are NOT near-dups of each other (no quadratic
    per-family pair blowup), while two docs that were near-dups stay
    near-dups within each copy stratum: pair counts and dup structure
    grow ~linearly with the factor, which is the property a throughput
    scale-bench needs."""
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("copy")
    base = docs.select("doc_id", "text", "lang", "source", "n_chars", copies)
    words = F.split(F.col("text"), r"\s+")
    salted = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                i % 5 == 0,
                F.concat(w, F.lit("x"), F.col("copy").cast("string")))
            .otherwise(w)),
        " ")
    return base.select(
        (F.col("doc_id") * factor + F.col("copy")).alias("doc_id"),
        salted.alias("text"), "lang", "source",
        F.length(salted).alias("n_chars"))


def main() -> None:
    """Delegates to bench.scale_benchmark — the KMeans-quantizer IVF
    (trained on the base corpus, BLAS list assignment) and prebuilt
    SRP-LSH, both recall-measured against the exact scan."""
    from bench import scale_benchmark

    factors = [int(x) for x in sys.argv[1:]] or [10, 50]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = scale_benchmark(spark, "/root/testdata/sf0.1", factors)
    for entry in results:
        print(json.dumps(entry))
    print(json.dumps({"scale_probe": results}))
    spark.stop()


if __name__ == "__main__":
    main()


def inflate_events(events, factor: int, user_stride: int = 100_000):
    """``factor`` copies of the events table for the behavioral-family
    scale bench.  Each copy is a FRESH user population (user_id offset
    by a copy-specific stride), so per-user event counts stay constant
    while total volume grows — the realistic growth mode (more users,
    not deeper histories), and the one that keeps per-key state bounded
    for funnels, retention, and sessionization."""
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("copy")
    base = events.select("event_id", "ts", "user_id", "event_type",
                         "value", copies)
    return base.select(
        (F.col("event_id") * factor + F.col("copy")).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * user_stride).alias("user_id"),
        "event_type", "value")
