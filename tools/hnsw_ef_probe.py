"""HNSW ef_search sweep on an inflated corpus — the probe behind the
README claim that the 1M-row copy-degenerate recall dip is purely the
beam knob (ef 64 / 128 / 256 → recall 0.86 / 0.95 / 1.0 at 1M rows).

Builds the persisted artifact ONCE, then searches it at each beam
width, recall-measured against the exact BLAS scan.

Usage::

    python tools/hnsw_ef_probe.py [factor] [ef ...]   # default 500 64 128 256
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.index_store import (
    hnsw_build_index,
    hnsw_load,
    hnsw_save,
    hnsw_search,
)
from python_vector_db___ai_spark.operators.ivf import recall_against_exact
from python_vector_db___ai_spark.operators.search import knn_join_blas
from python_vector_db___ai_spark.session import get_spark, load_table
from tools.scale_probe import inflate

_RESULT_SCHEMA = "query_id long, vec_id long, score double, rank long"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    efs = [int(x) for x in sys.argv[2:]] or [64, 128, 256]
    spark = get_spark("hnsw-ef-probe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = (emb.filter(F.col("vec_id") < 10)
               .select((F.col("vec_id") * 10 ** 6).alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    tmp = tempfile.mkdtemp(prefix="hnsw_ef_probe_")
    try:
        inflate(emb, factor).write.parquet(tmp + "/corpus",
                                           mode="overwrite")
        corpus = spark.read.parquet(tmp + "/corpus").cache()
        out = {"factor": factor, "corpus_rows": corpus.count()}
        exact = spark.createDataFrame(
            knn_join_blas(queries, corpus, k=10, metric="cosine",
                          corpus_id="vec_id").collect(),
            _RESULT_SCHEMA).cache()
        t0 = time.perf_counter()
        hnsw_save(hnsw_build_index(corpus, n_partitions=32), tmp + "/g")
        out["build_sec"] = round(time.perf_counter() - t0, 2)
        idx = hnsw_load(spark, tmp + "/g")
        for ef in efs:
            t0 = time.perf_counter()
            rows = hnsw_search(queries, idx, k=10, ef_search=ef).collect()
            sec = round(time.perf_counter() - t0, 2)
            df = spark.createDataFrame(rows, _RESULT_SCHEMA)
            rec = round(recall_against_exact(df, exact,
                                             corpus_id="vec_id")
                        .agg(F.avg("recall")).collect()[0][0], 4)
            out[f"ef{ef}"] = {"search_sec": sec, "recall": rec}
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
