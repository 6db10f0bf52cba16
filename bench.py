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
    "knn_exact_cosine",        # J1/T2 exact batch kNN (BLAS local top-k)
    "knn_exact_l2",            # exact kNN, L2
    "ivf_search_cosine",       # X2 IVF pruned ANN search
    "ann_recall_ivf",          # X6 recall harness (approx + exact)
    "topk_similar_pairs",      # T3 all-pairs top-k
    "ir_metrics_per_query",    # W1-W6 ranking metrics
    "dedup_exact",             # exact dedup hash groupBy
    "dedup_minhash_lsh",       # MinHash+LSH banding
    "dedup_simhash_fingerprints",  # SimHash fingerprints
    "text_lang_id",            # language ID heuristic
    "text_quality",            # quality scoring
    "chunk_chars_fixed",       # char chunker (pure expressions)
    "mock_embed_docs",         # embedding pipeline (mock model)
    "rag_context_build",       # RAG context assembly
    "events_sessionization",   # gap sessionization window
    "tpch_q1_pricing",         # relational aggregation
    "tpch_q3_topk",            # 3-way join + top-k
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warm-up: JVM + parquet footer reads don't belong to any query.
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name].spark_fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
