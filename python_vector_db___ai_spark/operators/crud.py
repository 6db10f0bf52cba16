"""Document CRUD operators (SURVEY §2.1 S9-S11, §2.4 J5/J6, §2.5 A1-A3/A6).

The reference's mutation surface (Chroma add/delete, pgvector upsert,
day_8/database.py + day_9/database/vector_ops.py) re-expressed as
DataFrame transforms over immutable tables:

* **upsert** = union + per-key ``row_number`` keeping the newest row —
  the plain-parquet emulation of ``MERGE INTO`` (Delta would make this
  a real merge; the call-site API is identical).
* **delete** = ``left_anti`` join.
* The write side is append/overwrite of the resulting DataFrame; at
  scale, partition the table by a stable key range so upserts rewrite
  only touched partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.inline import inline_table


def upsert(base: DataFrame, updates: DataFrame,
           key: str = "doc_id") -> DataFrame:
    """S10/J6: rows from ``updates`` win over ``base`` on key conflict
    (INSERT ... ON CONFLICT DO UPDATE,
    day_9/database/vector_ops.py:103-131).  Ties within ``updates``
    keep a deterministic single row: the window breaks priority ties on
    a content hash of the full row, so the winner does not depend on
    partition or arrival order."""
    tagged = (base.withColumn("_prio", F.lit(0))
              .unionByName(updates.withColumn("_prio", F.lit(1))))
    w = Window.partitionBy(key).orderBy(
        F.col("_prio").desc(),
        F.md5(F.to_json(F.struct(*[c for c in tagged.columns
                                   if c != "_prio"]))).asc())
    return (tagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn"))


def delete_ids(df: DataFrame, ids: DataFrame | Sequence,
               key: str = "doc_id") -> DataFrame:
    """S11/J5: anti-join delete (day_8/database.py:86-92)."""
    if not isinstance(ids, DataFrame):
        if not ids:
            return df                      # empty deletion list: no-op
        # VALUES-inlined LocalRelation (stable canonicalization →
        # cache/exchange reuse across rebuilds), not an RDD-backed
        # literal — see functions/inline.py.
        typ = ("string" if any(isinstance(i, str) for i in ids)
               else "long")
        ids = inline_table(df.sparkSession, [(i,) for i in ids],
                           f"{key} {typ}")
    return df.join(F.broadcast(ids.select(key)), key, "left_anti")


def get_by_ids(df: DataFrame, ids: Sequence, key: str = "doc_id") -> DataFrame:
    """P7 point lookup (day_8/database.py:66-84) — an IN filter that
    Catalyst pushes to the parquet scan."""
    return df.filter(F.col(key).isin(list(ids)))


def insert_tally(updates: DataFrame, text_col: str = "text",
                 key: str = "doc_id") -> DataFrame:
    """A6 batch-insert success/fail tally
    (day_9/database/vector_ops.py:276-298): a row 'fails' when its key
    is null or its content empty."""
    ok = F.col(key).isNotNull() & F.col(text_col).isNotNull() \
        & (F.length(text_col) > 0)
    return updates.agg(
        F.count("*").cast("long").alias("total"),
        F.sum(ok.cast("int")).cast("long").alias("successful"),
        F.sum((~ok).cast("int")).cast("long").alias("failed"))


def salted_agg(df: DataFrame, key: str, aggs: dict[str, str],
               n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation for skewed keys (SURVEY §7: 'skewed
    keys -> salting').

    Phase 1 aggregates on ``(key, salt)`` — the hot key's rows spread
    over ``n_salts`` reducers — phase 2 merges the partials on ``key``.
    ``aggs`` maps column -> 'sum'|'count'|'min'|'max' (the decomposable
    aggregates; avg = sum/count at the call site).  AQE's skew handling
    covers joins; this covers aggregations.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1_aggs, phase2_aggs = [], []
    for col, how in aggs.items():
        partial = f"_p_{col}"
        if how == "count":
            phase1_aggs.append(F.count(col).alias(partial))
            phase2_aggs.append(F.sum(partial).cast("long").alias(f"count_{col}"))
        elif how == "sum":
            phase1_aggs.append(F.sum(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(f"sum_{col}"))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(partial))
            phase2_aggs.append(F.min(partial).alias(f"min_{col}"))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(partial))
            phase2_aggs.append(F.max(partial).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate {how!r}")
    return (salted.groupBy(key, "_salt").agg(*phase1_aggs)
            .groupBy(key).agg(*phase2_aggs))


def format_results(df: DataFrame, include_content: bool = True,
                   include_scores: bool = True,
                   preview_chars: int | None = 200,
                   text_col: str = "text",
                   score_col: str = "score") -> DataFrame:
    """P10/P11 response shaping (day_12/src/main.py:99,
    day_9/models/schemas.py:50): optional content preview truncation and
    conditional include flags — projection-level, so Catalyst prunes the
    dropped columns out of the scan."""
    out = df
    if include_content:
        if preview_chars is not None and text_col in df.columns:
            out = out.withColumn(
                "content_preview", F.substring(F.col(text_col), 1, preview_chars)
            ).drop(text_col)
    elif text_col in df.columns:
        out = out.drop(text_col)
    if not include_scores and score_col in out.columns:
        out = out.drop(score_col)
    return out


def query_history_stats(log: DataFrame,
                        time_col: str = "retrieval_time") -> DataFrame:
    """A12 pipeline timing stats over the S13 audit log
    (day_12/src/main.py:455-477, day_13/src/main.py:310-319):
    avg/total processing time and queries-per-second."""
    return log.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg(time_col), 6).alias("avg_time_sec"),
        F.round(F.sum(time_col), 6).alias("total_time_sec"),
        F.round(F.count("*") / F.sum(time_col), 6).alias("qps"))


def collection_stats(df: DataFrame, text_col: str = "text",
                     key: str = "doc_id") -> DataFrame:
    """A1-A3 collection statistics (day_9/database/vector_ops.py:251-258
    + the stats view 01_init_db.sql:114-121)."""
    return df.agg(
        F.count("*").cast("long").alias("total_documents"),
        F.countDistinct(key).cast("long").alias("unique_ids"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_content_length"),
        F.min(F.length(text_col)).cast("long").alias("min_content_length"),
        F.max(F.length(text_col)).cast("long").alias("max_content_length"))
