"""Similarity search operators (SURVEY.md §2.4 J1, §2.7 T1-T4).

Spark-first design for the reference's query lifecycle
(``day_9/database/vector_ops.py:133-198``: embed → metadata filter →
distance → ORDER BY LIMIT k):

* the query set is small (the reference batches 100 queries,
  ``day_6/day6_complete.py:86-99``) → **broadcast nested-loop join**, so
  the 100-TB corpus side never shuffles; each corpus partition scores
  its rows against the broadcast queries and emits only local top-k
  candidates before the final per-query selection.
* metadata filters go into a plain ``filter`` *before* the join so
  Catalyst pushes them to the parquet scan.
* per-query top-k = ``row_number() OVER (PARTITION BY query ORDER BY
  score)`` with a deterministic ``id`` tie-break — at scale AQE handles
  the (tiny: n_queries x k candidates) final shuffle.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.vector import (
    DESCENDING_METRICS,
    METRICS,
    cosine_similarity,
)


def apply_metadata_filter(df: DataFrame, metadata_filter: Mapping[str, str] | None,
                          metadata_col: str = "metadata") -> DataFrame:
    """ANDed equality filter on a map column (P3/P4,
    day_8/database.py:49-54, day_9/database/vector_ops.py:165-174).

    Values are compared as strings, matching the reference's own
    coercion (day_9/database/vector_ops.py:171).
    """
    if not metadata_filter:
        return df
    for k, v in metadata_filter.items():
        df = df.filter(F.element_at(F.col(metadata_col), k) == str(v))
    return df


def score_column(metric: str, qcol: Column, ccol: Column) -> tuple[Column, bool]:
    """(score expression, descending?) for a named metric
    (day_9/models/schemas.py:6-13 DistanceMetric enum)."""
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(METRICS)}")
    return METRICS[metric](qcol, ccol), metric in DESCENDING_METRICS


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 10,
             metric: str = "cosine",
             query_id: str = "query_id", query_vec: str = "query_vec",
             corpus_id: str = "id", corpus_vec: str = "embedding",
             keep_corpus_cols: Sequence[str] = (),
             round_to: int | None = 6,
             exclude_self: bool = False) -> DataFrame:
    """Exact per-query top-k: every query scored against every corpus row
    (J1: day_4/day4_complete.py:58-79, day_6/day6_complete.py:86-99 flat
    search; T2 ORDER BY LIMIT day_9/database/vector_ops.py:176).

    Returns ``(query_id, corpus_id, score, rank)`` + ``keep_corpus_cols``.
    ``round_to`` rounds the score *before* ranking (with an ascending
    corpus-id tie-break) so the ordering is reproducible across engines
    regardless of last-bit float differences.
    """
    score, desc = score_column(metric, F.col(query_vec), F.col(corpus_vec))
    if round_to is not None:
        score = F.round(score, round_to)
    joined = (
        F.broadcast(queries.select(F.col(query_id), F.col(query_vec)))
        .crossJoin(corpus)
    )
    if exclude_self:
        # P8 exclude-self anti-predicate (day_9/main.py:373-376) — only
        # meaningful when query ids live in the corpus id domain.
        joined = joined.filter(F.col(query_id) != F.col(corpus_id))
    joined = joined.withColumn("score", score)
    order = [F.col("score").desc() if desc else F.col("score").asc(),
             F.col(corpus_id).asc()]
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        joined
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank", *keep_corpus_cols)
    )


def knn_join_blas(queries: DataFrame, corpus: DataFrame, k: int = 10,
                  metric: str = "cosine",
                  query_id: str = "query_id", query_vec: str = "query_vec",
                  corpus_id: str = "id", corpus_vec: str = "embedding",
                  round_to: int = 6,
                  exclude_self: bool = False) -> DataFrame:
    """Exact batch kNN, scale-path implementation.

    Identical results to :func:`knn_join` (same rounding + tie-break),
    different physical plan: the query matrix is shipped to every
    partition inside the closure (queries are small by contract — the
    reference batches 100, day_6/day6_complete.py:86-99) and each
    Arrow batch computes a NumPy/BLAS score matrix and keeps only its
    LOCAL top-k per query.  The shuffle that follows carries
    ``n_queries * k`` rows **per partition** instead of
    ``n_queries * n_corpus`` total — at 100 TB that is the difference
    between a merge of sketches and a full re-shuffle of the corpus.
    """
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "l2", "inner_product", "neg_inner_product"):
        raise ValueError(f"metric {metric!r} not supported by the BLAS path")
    desc = metric in DESCENDING_METRICS

    from python_vector_db___ai_spark.operators._guards import collect_small

    qrows = collect_small(
        queries.select(query_id, query_vec), "knn_join_blas queries",
        hint="Query batches are small by contract; for a large query "
             "side use knn_join (broadcast join) or batch the queries.")
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} long, {corpus_id} long, score double, "
                "rank long")
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(Q, axis=1)

    def local_topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf[corpus_vec].tolist(), dtype=np.float64)
            c_ids = pdf[corpus_id].to_numpy(dtype=np.int64)
            if metric == "cosine":
                cnorm = np.linalg.norm(C, axis=1)
                denom = np.outer(qnorm, cnorm)
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = (Q @ C.T) / denom
                S[(np.outer(qnorm <= 1e-12, np.ones(len(C), bool)))
                  | (np.outer(np.ones(len(Q), bool), cnorm <= 1e-12))] = 0.0
            elif metric == "l2":
                sq = (np.sum(Q * Q, axis=1)[:, None]
                      + np.sum(C * C, axis=1)[None, :] - 2.0 * (Q @ C.T))
                S = np.sqrt(np.clip(sq, 0.0, None))
            else:
                S = Q @ C.T
                if metric == "neg_inner_product":
                    S = -S
            S = np.round(S, round_to)
            kk = min(k + (1 if exclude_self else 0), len(c_ids))
            out_q, out_c, out_s = [], [], []
            for qi in range(len(q_ids)):
                keys = -S[qi] if desc else S[qi]
                order = np.lexsort((c_ids, keys))[:kk]
                out_q.append(np.full(len(order), q_ids[qi]))
                out_c.append(c_ids[order])
                out_s.append(S[qi][order])
            yield pd.DataFrame({
                query_id: np.concatenate(out_q),
                corpus_id: np.concatenate(out_c),
                "score": np.concatenate(out_s),
            })

    local = corpus.select(corpus_id, corpus_vec).mapInPandas(
        local_topk, schema=f"{query_id} long, {corpus_id} long, score double")
    if exclude_self:
        local = local.filter(F.col(query_id) != F.col(corpus_id))
    order = [F.col("score").desc() if desc else F.col("score").asc(),
             F.col(corpus_id).asc()]
    w = Window.partitionBy(query_id).orderBy(*order)
    return (local
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "score", "rank"))


def knn_join_blas_multi(queries: DataFrame, corpus: DataFrame, k: int = 10,
                        metric_labels=(("cosine", "cosine"), ("l2", "l2"),
                                       ("inner_product", "dot")),
                        query_id: str = "query_id",
                        query_vec: str = "query_vec",
                        corpus_id: str = "id",
                        corpus_vec: str = "embedding",
                        round_to: int = 6) -> DataFrame:
    """Batch kNN under SEVERAL metrics from ONE corpus pass.

    cosine, L2 and inner-product all derive from the same ``Q @ C.T``
    matrix (cosine divides by norms, L2 completes the square), so one
    Arrow scan + one matmul per batch serves every metric — versus one
    full corpus pass per metric with separate :func:`knn_join_blas`
    calls.  Per-metric results are identical to the single-metric path
    (same rounding, same id tie-break); the final merge is one window
    over ``(metric, query)`` using a direction-normalized sort key.

    ``metric_labels``: (metric, output label) pairs; returns
    ``(metric, query_id, corpus_id, score, rank)`` with ``metric`` set
    to the label.
    """
    import numpy as np
    import pandas as pd

    from python_vector_db___ai_spark.operators._guards import collect_small

    for m, _ in metric_labels:
        if m not in ("cosine", "l2", "inner_product", "neg_inner_product"):
            raise ValueError(f"metric {m!r} not supported by the BLAS path")

    qrows = collect_small(
        queries.select(query_id, query_vec), "knn_join_blas_multi queries",
        hint="Query batches are small by contract; batch the queries.")
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"metric string, {query_id} long, {corpus_id} long, "
                "score double, rank long")
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(Q, axis=1)
    qsq = np.einsum("ij,ij->i", Q, Q)

    def local_topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf[corpus_vec].tolist(), dtype=np.float64)
            c_ids = pdf[corpus_id].to_numpy(dtype=np.int64)
            dot = Q @ C.T                      # the one matmul
            cnorm = np.linalg.norm(C, axis=1)
            csq = np.einsum("ij,ij->i", C, C)
            kk = min(k, len(c_ids))
            frames = []
            for metric, label in metric_labels:
                if metric == "cosine":
                    denom = np.outer(qnorm, cnorm)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        S = dot / denom
                    S[(np.outer(qnorm <= 1e-12, np.ones(len(C), bool)))
                      | (np.outer(np.ones(len(Q), bool),
                                  cnorm <= 1e-12))] = 0.0
                    desc = True
                elif metric == "l2":
                    S = np.sqrt(np.clip(
                        qsq[:, None] + csq[None, :] - 2.0 * dot, 0.0, None))
                    desc = False
                elif metric == "neg_inner_product":
                    S = -dot
                    desc = False
                else:
                    S = dot
                    desc = True
                S = np.round(S, round_to)
                for qi in range(len(q_ids)):
                    keys = -S[qi] if desc else S[qi]
                    order = np.lexsort((c_ids, keys))[:kk]
                    frames.append(pd.DataFrame({
                        "metric": label,
                        query_id: np.full(len(order), q_ids[qi]),
                        corpus_id: c_ids[order],
                        "score": S[qi][order],
                        "_okey": keys[order]}))
            yield pd.concat(frames, ignore_index=True)

    local = corpus.select(corpus_id, corpus_vec).mapInPandas(
        local_topk,
        schema=f"metric string, {query_id} long, {corpus_id} long, "
               "score double, _okey double")
    w = Window.partitionBy("metric", query_id).orderBy(
        F.col("_okey").asc(), F.col(corpus_id).asc())
    return (local
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("metric", query_id, corpus_id, "score", "rank"))


def pairwise_metrics_blas(vectors: DataFrame, id_col: str = "id",
                          vec_col: str = "embedding",
                          round_to: int = 6) -> DataFrame:
    """All (i < j) pairs with BOTH rounded cosine and L2 distance from
    one broadcast matmul per partition — the vectorized form of the
    upper-triangle θ-join (small-by-contract corpora; guarded).
    Returns ``(i, j, cos_score, dist)``."""
    import numpy as np
    import pandas as pd

    from python_vector_db___ai_spark.operators._guards import collect_small

    rows = collect_small(
        vectors.select(id_col, vec_col).orderBy(id_col),
        "pairwise_metrics_blas corpus",
        hint="All-pairs output is quadratic; use the pruned/blocked "
             "near-dup operators for large corpora.")
    if not rows:
        return vectors.sparkSession.createDataFrame(
            [], "i long, j long, cos_score double, dist double")
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    V = np.array([r[vec_col] for r in rows], dtype=np.float64)
    vn = np.linalg.norm(V, axis=1)
    vsq = np.einsum("ij,ij->i", V, V)
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((ids, V, vn, vsq))

    def op(batches):
        ids_, V_, vn_, vsq_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            an = np.linalg.norm(A, axis=1)
            asq = np.einsum("ij,ij->i", A, A)
            dot = A @ V_.T
            with np.errstate(divide="ignore", invalid="ignore"):
                S = dot / np.outer(an, vn_)
            S[(np.outer(an <= 1e-12, np.ones(len(V_), bool)))
              | (np.outer(np.ones(len(A), bool), vn_ <= 1e-12))] = 0.0
            D = np.sqrt(np.clip(
                asq[:, None] + vsq_[None, :] - 2.0 * dot, 0.0, None))
            keep = ids_[None, :] > a_ids[:, None]          # i < j only
            r, c = np.nonzero(keep)
            yield pd.DataFrame({
                "i": a_ids[r], "j": ids_[c],
                "cos_score": np.round(S[r, c], round_to),
                "dist": np.round(D[r, c], round_to)})

    return vectors.select(id_col, vec_col).mapInPandas(
        op, schema="i long, j long, cos_score double, dist double")


def search(corpus: DataFrame, query_vec_lit, k: int = 10, metric: str = "cosine",
           metadata_filter: Mapping[str, str] | None = None,
           corpus_id: str = "id", corpus_vec: str = "embedding",
           metadata_col: str = "metadata") -> DataFrame:
    """Single-query search — the ``POST /search`` lifecycle (SURVEY §3.1):
    filter (pushed down) → score → TakeOrderedAndProject.

    ``query_vec_lit`` is a Python list; it becomes an ``array`` literal so
    the whole plan is one codegen'd scan + top-k, no join at all.
    """
    qcol = F.array(*[F.lit(float(x)) for x in query_vec_lit])
    score, desc = score_column(metric, qcol, F.col(corpus_vec))
    filtered = apply_metadata_filter(corpus, metadata_filter, metadata_col)
    scored = filtered.withColumn("score", score)
    order = [F.col("score").desc() if desc else F.col("score").asc(),
             F.col(corpus_id).asc()]
    return scored.orderBy(*order).limit(k)


def topk_pairs(vectors: DataFrame, k: int = 5, metric: str = "cosine",
               id_col: str = "id", vec_col: str = "embedding",
               threshold: float | None = None) -> DataFrame:
    """Top-k most similar (i, j) pairs with i < j (T3,
    day_5/day5_complete.py:122-146 upper-triangle scan).

    Self-join on the id inequality; for the small corpora this mirrors
    the reference exactly — at 100 TB the LSH/IVF paths in
    ``operators.dedup`` / ``operators.ivf`` replace the O(n^2) join.
    """
    a = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    score, desc = score_column(metric, F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, F.col("i") < F.col("j"))
        .withColumn("score", score)
        .select("i", "j", "score")
    )
    if threshold is not None:
        pairs = pairs.filter(F.col("score") >= threshold if desc
                             else F.col("score") <= threshold)
    order = [F.col("score").desc() if desc else F.col("score").asc(),
             F.col("i").asc(), F.col("j").asc()]
    return pairs.orderBy(*order).limit(k)


def similarity_matrix(vectors: DataFrame, id_col: str = "id",
                      vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine matrix in long form (V6,
    day_2/noramalization.py:176-185) — every (i, j) including the
    diagonal; symmetric by construction.  Small-n diagnostic only."""
    a = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .select("i", "j", cosine_similarity(F.col("va"), F.col("vb")).alias("sim"))
    )
