"""Sinks (SURVEY §2.1 S2-S4, S13).

The reference persists embeddings as .npy + pickle sidecars and exports
npz/json/csv (day_4/day4_complete.py:24-51,
day_10/embedders/embedding_pipeline.py:316-382).  Spark folds the
sidecar metadata into the same table and writes splittable columnar
files — no sidecars, no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_embeddings(df: DataFrame, path: str, fmt: str = "parquet",
                      vec_col: str = "embedding",
                      mode: str = "overwrite") -> None:
    """S2/S4 embedding export: parquet (the .npy analog), json, or
    csv-flat (``embed_0..embed_N`` columns,
    day_10/embedders/embedding_pipeline.py:358-377)."""
    if fmt == "parquet":
        df.write.mode(mode).parquet(path)
    elif fmt == "json":
        df.write.mode(mode).json(path)
    elif fmt == "csv":
        dim = len(df.select(vec_col).first()[0])
        flat = df.select(
            *[c for c in df.columns if c != vec_col],
            *[F.col(vec_col)[i].alias(f"embed_{i}") for i in range(dim)])
        flat.write.mode(mode).option("header", "true").csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def append_query_log(df: DataFrame, path: str) -> None:
    """S13 append-only audit log (day_12/src/main.py:479-490): every
    query/response row lands in an append-mode parquet table with an
    ingest timestamp — the Delta-table audit pattern at scale."""
    df.withColumn("logged_at", F.current_timestamp()) \
      .write.mode("append").parquet(path)


def estimate_index_memory_bytes(n_vectors: int, dim: int,
                                kind: str = "flat",
                                hnsw_m: int = 32) -> int:
    """X8 memory estimation (day_6/day6_complete.py:265-270):
    flat = n*dim*4 bytes; hnsw adds n*M*4 link bytes.  Plan-time
    arithmetic for sizing broadcast/cache decisions."""
    base = n_vectors * dim * 4
    if kind == "flat":
        return base
    if kind == "hnsw":
        return base + n_vectors * hnsw_m * 4
    raise ValueError(f"unknown kind {kind!r}")
