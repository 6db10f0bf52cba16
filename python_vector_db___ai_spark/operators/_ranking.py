"""Shared per-query top-k selection.

Every approximate-search path ends the same way: rank candidates per
query by the rounded score with an ascending-id tie-break and keep the
top k.  The repo's cross-engine determinism contract depends on every
path using the IDENTICAL ordering, so the tail lives here once instead
of drifting across copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_window(scored: DataFrame, k: int, query_id: str, corpus_id: str,
                score_col: str = "score", desc: bool = True) -> DataFrame:
    """(query, candidate, score) -> per-query top-k with dense ranks:
    ``(query_id, corpus_id, score_col, rank)``; ``desc`` picks the
    score direction, ties always break on ascending ``corpus_id``."""
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc() if desc else F.col(score_col).asc(),
        F.col(corpus_id).asc())
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, score_col, "rank"))
