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


def global_topk_ranked(scored: DataFrame, k: int, score_col: str,
                       id_col: str, desc: bool = True) -> DataFrame:
    """Global (corpus-wide) top-k with ranks attached, scale-safely.

    An unpartitioned ``Window.orderBy`` funnels every row through one
    task; ``orderBy().limit(k)`` instead compiles to
    TakeOrderedAndProject — each partition keeps its local k, the
    driver merges k·P candidates — and the rank window then runs over
    at most k survivors, which is free.  Ordering contract is the
    engine-wide one: score (``desc`` direction), ascending id
    tie-break.
    """
    order = [F.col(score_col).desc() if desc else F.col(score_col).asc(),
             F.col(id_col).asc()]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


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
