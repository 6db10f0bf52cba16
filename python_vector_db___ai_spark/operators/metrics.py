"""Retrieval-quality (IR) metrics over ranked results (SURVEY §2.6 W1-W6,
§2.5 A7).

Re-expresses the reference's per-query Python loops
(``day_13/src/main.py:126-237``: P@k, R@k, F1@k, average precision,
reciprocal rank, NDCG@k, hit-rate@k, then ``np.mean`` across queries) as
one window + one hash aggregation:

* relevance flag = ``left_semi``-style join of ranked results against
  the ground-truth pairs (J2);
* running relevant-count window (``ROWS UNBOUNDED PRECEDING``) gives
  precision-at-rank for AP (W3);
* IDCG uses the closed form over ``sequence(1, least(n_rel, k))`` so no
  second ranking pass is needed (W5);
* the final mean is a scalar aggregation (A7).

Everything is built-in expressions — at 100 TB this is one shuffle on
``query_id`` (the window) and one reduce; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METRIC_COLS = ("precision_at_k", "recall_at_k", "f1_at_k", "avg_precision",
                "reciprocal_rank", "ndcg_at_k", "hit_rate_at_k")


def ranking_metrics(results: DataFrame, relevant: DataFrame, k: int = 10,
                    query_col: str = "query_id", doc_col: str = "doc_id",
                    rank_col: str = "rank",
                    round_to: int | None = 6) -> DataFrame:
    """Per-query metrics at cutoff ``k``.

    ``results``: ranked retrievals ``(query_col, doc_col, rank_col)`` with
    1-based dense ranks per query (W1).
    ``relevant``: ground-truth pairs ``(query_col, doc_col)`` — the
    relational form of ``Query.relevant_doc_ids``
    (day_13/src/main.py:43-57).

    Formulas match day_13/src/main.py:126-208: AP divides by |relevant|,
    NDCG uses binary gain ``1/log2(rank+1)``, RR is 0 when nothing
    relevant is retrieved.
    """
    rel_pairs = relevant.select(query_col, doc_col).distinct()
    n_rel = (rel_pairs.groupBy(query_col)
             .agg(F.count("*").cast("long").alias("n_relevant")))

    flagged = (
        results
        .join(rel_pairs.withColumn("_rel", F.lit(1)), [query_col, doc_col],
              "left")
        .withColumn("rel", F.coalesce(F.col("_rel"), F.lit(0)))
        .drop("_rel")
    )
    w = (Window.partitionBy(query_col).orderBy(rank_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    flagged = flagged.withColumn("cum_rel", F.sum("rel").over(w))

    at_k = F.col(rank_col) <= k
    rel_d = F.col("rel").cast("double")
    per_query = (
        flagged.groupBy(query_col)
        .agg(
            F.sum(F.when(at_k, F.col("rel")).otherwise(0)).alias("rel_at_k"),
            F.sum(F.when(at_k, 1).otherwise(0)).alias("n_at_k"),
            F.sum(F.when(F.col("rel") == 1,
                         F.col("cum_rel") / F.col(rank_col))).alias("ap_num"),
            F.max(F.when(F.col("rel") == 1,
                         F.lit(1.0) / F.col(rank_col))).alias("rr_raw"),
            F.sum(F.when(at_k & (F.col("rel") == 1),
                         F.lit(1.0) / F.log2(F.col(rank_col) + 1))
                  ).alias("dcg"),
            F.max(F.when(at_k, rel_d).otherwise(F.lit(0.0))).alias("hit_raw"),
        )
        # FULL join: a query with ground truth but zero retrieved rows
        # must still produce an (all-zero) metrics row — dropping it
        # would inflate the means (the reference's np.mean runs over
        # every query, day_13/src/main.py:210-237).
        .join(n_rel, query_col, "full")
        .withColumn("n_relevant", F.coalesce(F.col("n_relevant"), F.lit(0)))
        .withColumn("rel_at_k", F.coalesce(F.col("rel_at_k"), F.lit(0)))
        .withColumn("n_at_k", F.coalesce(F.col("n_at_k"), F.lit(0)))
        .withColumn("hit_raw", F.coalesce(F.col("hit_raw"), F.lit(0.0)))
    )

    # Guarded: Spark's sequence(1, x) counts DOWN for x < 1, so an
    # unguarded closed form would evaluate 1/log2(1) for a query with
    # no relevant docs (ANSI mode: DIVIDE_BY_ZERO crash).
    idcg = F.when(
        F.col("n_relevant") > 0,
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(k))),
            F.lit(0.0),
            lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
        )).otherwise(F.lit(0.0))
    # The reference divides by len(top_k_docs) = min(k, n_retrieved),
    # not by k (day_13/src/main.py:143) — required to reproduce its
    # committed P@10 = 0.35 over 5-doc result lists.
    p = F.when(F.col("n_at_k") > 0,
               F.col("rel_at_k").cast("double") / F.col("n_at_k")) \
         .otherwise(F.lit(0.0))
    r = F.when(F.col("n_relevant") > 0,
               F.col("rel_at_k").cast("double") / F.col("n_relevant")) \
         .otherwise(F.lit(0.0))
    out = (
        per_query
        .withColumn("precision_at_k", p)
        .withColumn("recall_at_k", r)
        .withColumn("f1_at_k",
                    F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)))
        .withColumn("avg_precision",
                    F.when(F.col("n_relevant") > 0,
                           F.coalesce(F.col("ap_num"), F.lit(0.0))
                           / F.col("n_relevant")).otherwise(F.lit(0.0)))
        .withColumn("reciprocal_rank", F.coalesce(F.col("rr_raw"), F.lit(0.0)))
        .withColumn("ndcg_at_k",
                    F.when(idcg > 0,
                           F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg)
                    .otherwise(F.lit(0.0)))
        .withColumn("hit_rate_at_k", F.col("hit_raw"))
        .select(query_col, "n_relevant", *_METRIC_COLS)
    )
    if round_to is not None:
        for c in _METRIC_COLS:
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out


def mean_metrics(per_query: DataFrame, round_to: int | None = 6) -> DataFrame:
    """Mean of every metric across queries (A7,
    day_13/src/main.py:210-237) — one-row DataFrame."""
    aggs = [F.avg(c).alias(f"mean_{c}") for c in _METRIC_COLS]
    out = per_query.agg(F.count("*").cast("long").alias("n_queries"), *aggs)
    if round_to is not None:
        for c in _METRIC_COLS:
            out = out.withColumn(f"mean_{c}", F.round(F.col(f"mean_{c}"), round_to))
    return out
